package graft.operators
import graft.Q
object Aggregates { val qs: Seq[Q] = Seq() }

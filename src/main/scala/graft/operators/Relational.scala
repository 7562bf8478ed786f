package graft.operators
import graft.Q
object Relational { val qs: Seq[Q] = Seq() }

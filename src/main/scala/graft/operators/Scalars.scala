package graft.operators
import graft.Q
object Scalars { val qs: Seq[Q] = Seq() }

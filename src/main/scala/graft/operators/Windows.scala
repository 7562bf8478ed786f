package graft.operators
import graft.Q
object Windows { val qs: Seq[Q] = Seq() }

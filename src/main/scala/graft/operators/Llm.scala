package graft.operators
import graft.Q
object Llm { val qs: Seq[Q] = Seq() }

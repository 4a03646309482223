package graft.core

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, ExecutionContextExecutorService, Future}

/** Overlap INDEPENDENT Spark actions from driver threads (optimization
  * guide §2.6 "Overlap independent jobs"): Spark's scheduler runs
  * several jobs at once inside one application — actions are only
  * sequential because driver code calls them sequentially. The
  * multi-action metric evaluators (composite score, distribution
  * record, predictive train+eval) each run 4–8 independent jobs whose
  * tails would otherwise leave the executors idle; submitting them
  * concurrently back-fills the idle capacity and cuts the operator's
  * wall clock without changing any job's computation (each leg is the
  * byte-identical plan it was when sequential — FIFO scheduling only
  * interleaves them).
  *
  * The pool is a CACHED daemon pool, not a fixed one: evaluators nest
  * (q32's predictive legs each run a distribution evaluator), and a
  * fixed pool whose slots are all blocked parents would deadlock the
  * children. Cached threads grow with the nesting depth actually used
  * (bounded by the operator call tree, single digits) and die after
  * 60 s idle. */
object Par {

  private lazy val pool: ExecutionContextExecutorService =
    ExecutionContext.fromExecutorService(
      Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-par")
        t.setDaemon(true)
        t
      }))

  /** Run every thunk concurrently, return results in order. The LAST
    * thunk runs on the calling thread (no pool slot is held by a
    * blocked parent while its own legs run). Failures propagate the
    * first thrown exception after all legs settle. */
  def seq[A](thunks: Seq[() => A]): Seq[A] = {
    if (thunks.isEmpty) return Nil
    val fs = thunks.init.map(t => Future(t())(pool))
    val last = thunks.last()
    fs.map(f => Await.result(f, Duration.Inf)) :+ last
  }

  def par2[A, B](a: => A, b: => B): (A, B) = {
    val fa = Future(a)(pool)
    val rb = b
    (Await.result(fa, Duration.Inf), rb)
  }

  def par3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val fa = Future(a)(pool)
    val fb = Future(b)(pool)
    val rc = c
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf), rc)
  }

  def par4[A, B, C, D](a: => A, b: => B, c: => C, d: => D): (A, B, C, D) = {
    val fa = Future(a)(pool)
    val fb = Future(b)(pool)
    val fc = Future(c)(pool)
    val rd = d
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf),
      Await.result(fc, Duration.Inf), rd)
  }
}

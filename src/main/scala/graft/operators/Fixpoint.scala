package graft.operators

import org.apache.spark.sql.DataFrame

/** Semi-naive fixpoint evaluation for recursive rules — the analog of
  * the reference's recursive `<-` Prolog clauses (reference
  * prologc.lisp:626-700, 744-746), with the `%tick` inference budget
  * and deadline (prologc.lisp:859-900) mapped to explicit iteration /
  * row / wall-clock caps (SURVEY.md §7.2 step 5, §7.4).
  *
  * Semi-naive: each round the `step` function is applied only to the
  * *delta* (facts new in the previous round), and results already in
  * the accumulated set are anti-joined away — so a cyclic graph
  * converges instead of looping, where the reference relied on budgets.
  */
object Fixpoint {

  final case class Budget(
      maxIterations: Int = 50,
      maxRows: Long = 10_000_000L,
      timeoutMillis: Long = 300_000L)

  final class BudgetExceeded(msg: String) extends RuntimeException(msg)

  /** @param base  initial fact set
    * @param step  delta => new candidate facts (may contain duplicates
    *              of known facts; they are removed here)
    * @param keyCols columns forming fact identity for dedup
    * @return the fixpoint (base ∪ all derived facts)
    */
  def semiNaive(base: DataFrame, keyCols: Seq[String], budget: Budget = Budget())(
      step: DataFrame => DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    var all = base.dropDuplicates(keyCols).localCheckpoint(eager = true)
    var delta = all
    var iters = 0
    while (!delta.isEmpty) {
      iters += 1
      if (iters > budget.maxIterations)
        throw new BudgetExceeded(s"fixpoint exceeded ${budget.maxIterations} iterations")
      if ((System.nanoTime() - t0) / 1000000 > budget.timeoutMillis)
        throw new BudgetExceeded(s"fixpoint exceeded ${budget.timeoutMillis} ms")
      delta = step(delta).dropDuplicates(keyCols)
        .join(all, keyCols, "left_anti")
        .localCheckpoint(eager = true)
      all = all.union(delta).localCheckpoint(eager = true)
      if (all.count() > budget.maxRows)
        throw new BudgetExceeded(s"fixpoint exceeded ${budget.maxRows} rows")
    }
    all
  }
}

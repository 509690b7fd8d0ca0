package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, pmod, xxhash64}

/** A DECLARED single-partition window key for BOUNDED inputs.
  *
  * `WindowExec` logs "No Partition Defined … moving all data to a single
  * partition" for every empty partition spec — correctly, because an
  * accidental global window is a scale-killer. This engine has exactly
  * four windows that are global ON PURPOSE, each over an input bounded
  * by construction (a 256-row bucket table, ≤2^17-row centroid seed
  * tables, a k-row probe result). Left unpartitioned, their warnings
  * flood the bench tail and would mask a REAL unpartitioned-window
  * regression (VERDICT r10 watch item 1).
  *
  * [[BoundedWindow.key]] makes the intent explicit in the plan: a
  * constant-0 partition key that is deliberately NON-foldable
  * (`pmod(xxhash64(c), 1)`), so Spark 4's `EliminateWindowPartitions`
  * rule cannot fold it back to an empty spec — a plain `lit(0)` would
  * be. Execution is identical (every row hashes to the one partition
  * the bounded input was headed for anyway; the per-row xxhash64 is
  * noise at ≤2^17 rows), but the partition spec is non-empty, so the
  * warning fires only for windows that are accidentally global.
  *
  * Any new `Window.orderBy` without a partition spec is a review flag:
  * either partition it by a real key, or — if its input is provably
  * bounded — route it through this helper and say why at the call site.
  */
object BoundedWindow {

  /** Constant-0, non-foldable partition key; `c` is any non-foldable
    * column of the input (its values don't matter). */
  def key(c: Column): Column = pmod(xxhash64(c), lit(1))
}

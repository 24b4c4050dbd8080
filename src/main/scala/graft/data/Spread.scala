package graft.data

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism floor repair (optimization guide §2.5: "one huge
  * unsplittable file … repartition immediately after the read").
  *
  * The bench tables are single-file, single-row-group parquet, so every
  * scan plans as ONE task and everything computed in the scan stage —
  * tokenizer UDFs, PNG synthesis, n-gram hashing — runs single-threaded
  * no matter how many cores the session has. At production scale the same
  * tables arrive in thousands of row groups and the scan is already wide;
  * a blind repartition there would pay a pointless shuffle (of payload
  * bytes, the §8 anti-pattern). So the spread is CONDITIONAL: only when
  * the frame's planned partition count is below the session's default
  * parallelism does it hash-repartition up to it.
  *
  * Hash-by-key rather than round-robin: keyless `repartition(n)` pays a
  * full local sort of its input first (`spark.sql.execution.
  * sortBeforeRepartition`, on by default so retried tasks reproduce their
  * row→partition assignment) — partitioning by a stable key column is
  * deterministic under retry for free and skips that sort. An explicit
  * partition COUNT also pins the shuffle against AQE coalescing (AQE
  * never coalesces user-numbered repartitions), which would otherwise
  * fold a few hundred KB straight back into one partition.
  */
object Spread {

  /** `df` hash-partitioned `defaultParallelism`-wide by `key` when its
    * planned partition count is below that; unchanged otherwise. Apply
    * BEFORE the expensive per-row work so the shuffle moves the narrow
    * pre-UDF columns, not derived payloads. */
  def byKey(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // toRdd, not .rdd: both plan the query once to read the partition
    // count (the accepted, documented double-pay — the count exists only
    // on the physical plan), but .rdd additionally appends the
    // internal-row → external-row deserializer to the lineage it builds.
    if (df.queryExecution.toRdd.getNumPartitions < p)
      df.repartition(p, key)
    else df
  }
}

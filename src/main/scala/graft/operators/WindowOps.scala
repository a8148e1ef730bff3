package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Partition-window operators.
  *
  * The reference's only window shapes are whole-partition aggregates
  * (`groupby(...).transform(...)` — nextflow/bin/process_pdb_contacts.py:400-404),
  * the argmax "best" flag (produce_neo4j_files.py:423-425) and a dense group
  * id (process_pdb_structure.py:138). All are expressed with
  * `Window.partitionBy` (no orderBy → frame degenerates to the whole
  * partition), which Spark executes as a single hash-shuffle on the partition
  * keys — no sort needed, and the shuffle is reusable by downstream
  * aggregations on the same keys.
  */
object WindowOps {

  /** D4 — flag every row achieving the per-group maximum of `value`.
    * Ties all receive "Y" (reference keeps multiple best cognates on a tie,
    * produce_neo4j_files.py:423-425). One shuffle on `groupCols`.
    */
  def argmaxFlag(df: DataFrame, groupCols: Seq[String], value: Column,
                 flagName: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn(flagName,
      when(value === max(value).over(w), lit("Y")).otherwise(lit("N")))
  }

  /** D3 — grouped transform: whole-partition sum attached to every row plus
    * each row's share of it, mirroring process_pdb_contacts.py:400-404
    * (the non-minor-member count there is `sum(when(share > t, 1)).over(w)`
    * on top of the share column this produces). No row reduction.
    */
  def withGroupShare(df: DataFrame, groupCols: Seq[String], value: Column,
                     totalName: String, shareName: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn(totalName, sum(value).over(w))
      // nullif guard: a zero-sum group (all-zero counts or signed values
      // netting to zero) must yield a null share, not a DIVIDE_BY_ZERO
      // failure under ANSI mode — same convention as VectorFunctions
      // .cosine. Registered callers always divide positive-count totals,
      // so their oracle values are unchanged.
      .withColumn(shareName, value / nullif(col(totalName), lit(0)))
  }

  /** D5 — deterministic dense group id *within a partition* over explicitly
    * ordered keys (replaces pandas' order-sensitive `ngroup()`; the
    * reference numbers bound-molecule groups within one PDB entry,
    * process_pdb_structure.py:138 — `bm{n}`). Partitioned form: each
    * partition key's groups are numbered independently, so the window
    * parallelizes across the partition keys — no single-partition funnel.
    */
  def denseGroupId(df: DataFrame, partCols: Seq[String],
                   orderCols: Seq[String], idName: String): DataFrame =
    df.withColumn(idName,
      dense_rank().over(Window.partitionBy(partCols.map(col): _*)
        .orderBy(orderCols.map(col): _*)).cast("long"))

  /** D5 (global variant) — dense id over a whole *dimension-sized* frame.
    * Funnels through one partition by construction (global ordering);
    * only for bounded key spaces (the reference's distinct-descriptor and
    * distinct-SMILES id assignment, process_all_pdb_contacts.py:222-229,
    * get_ec_information.py:664-666 — both dimension-cardinality). At fact
    * scale use the partitioned overload or `hash`-based surrogate ids.
    */
  def denseGroupIdGlobal(df: DataFrame, orderCols: Seq[String],
                         idName: String): DataFrame =
    df.withColumn(idName,
      dense_rank().over(Window.orderBy(orderCols.map(col): _*)).cast("long"))

  /** F2 / I4 — preference pick: keep exactly one row per group, chosen by an
    * explicit total order (reference: OpenEye-first descriptor selection,
    * process_all_pdb_contacts.py:34-58; shortest-name display selection,
    * get_ec_information.py:297-299).
    */
  def preferenceFirst(df: DataFrame, groupCols: Seq[String],
                      order: Seq[Column]): DataFrame = {
    // temp name chosen to not collide with any input column
    val rn = Iterator.from(0).map(i => s"__graft_rn$i")
      .find(n => !df.columns.contains(n)).get
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1).drop(rn)
  }

  /** F3 — compress a set of ints per group into "1-3,5,9-12" range strings
    * (reference find_ec_ranges, process_all_pdb_contacts.py:76-101).
    * Implemented as gaps-and-islands with windows instead of a per-group UDF:
    * stays inside whole-stage codegen and shuffles once on the group key.
    *
    * Numeric values only: non-castable values become null and are dropped.
    * The reference appends non-numeric final-level ECs after the ranges —
    * callers needing that split numeric/non-numeric first and concat the
    * leftover tail (see the ADVICE.md round-2 note).
    */
  def rangeCompress(df: DataFrame, groupCol: String, intCol: String,
                    outName: String): DataFrame = {
    // try_cast + explicit drop: under Spark 4's default ANSI mode a plain
    // cast would THROW on the reference's non-numeric final-level ECs
    // ("n1"), and a silent null would otherwise form a phantom null-island
    val distinctVals = df
      .select(col(groupCol), expr(s"try_cast(`$intCol` AS BIGINT)").as("v"))
      .filter(col("v").isNotNull).distinct()
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("v"))
    val islands = distinctVals
      .withColumn("grp", col("v") - row_number().over(wOrd))
      .groupBy(col(groupCol), col("grp"))
      .agg(min("v").as("lo"), max("v").as("hi"))
      .withColumn("piece",
        when(col("lo") === col("hi"), col("lo").cast("string"))
          .otherwise(concat(col("lo").cast("string"), lit("-"), col("hi").cast("string"))))
    islands.groupBy(col(groupCol))
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("lo"), col("piece")))),
          x => x.getField("piece"))).as(outName))
  }
}

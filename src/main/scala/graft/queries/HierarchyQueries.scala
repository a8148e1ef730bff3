package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{RQ, Tables}

/** Dotted-code hierarchies (EC class→subclass→subsubclass→id,
  * utils.py:54-71; per-level node materialization,
  * produce_neo4j_files.py:80-95; partial-EC expansion, utils.py:243-256).
  *
  * Codes are synthesized deterministically from the part dimension:
  * `l1.l2.l3.l4` = (brand number, size div 10, size mod 10, partkey mod 7)
  * — shared prefixes arise naturally, like real EC numbers.
  */
object HierarchyQueries {

  // ONE code-scheme definition, shared with the export stage's EC
  // node/rel files (etl.ExportStage.ecCode)
  private def codes(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part").select(
      graft.etl.ExportStage.ecCode(col("p_brand"), col("p_size"),
        col("p_partkey")).as("code"))

  // ONE level-extraction definition, shared with the export (a scheme
  // change hits the ec1/ec2 oracles and the EC files together)
  private def level(c: Column, n: Int): Column =
    graft.etl.ExportStage.ecLevel(c, n)

  val defs: Seq[RQ] = Seq(

    // Per-level hierarchy node tables, materialized like the reference's
    // ecClass/ecSubClass/ecSubSubClass tables and unioned with a level tag
    RQ("ec1_hierarchy_rollup", Some("""
      WITH codes AS (SELECT regexp_extract(p_brand, '#(\d+)', 1) || '.' ||
                            (p_size // 10) || '.' || (p_size % 10) || '.' ||
                            (p_partkey % 7) AS code
                     FROM part),
           l1 AS (SELECT 'class' AS lvl, str_split(code, '.')[1] AS node,
                         CAST(count(*) AS BIGINT) AS n
                  FROM codes GROUP BY 2),
           l2 AS (SELECT 'subclass' AS lvl,
                         str_split(code, '.')[1] || '.' ||
                         str_split(code, '.')[2] AS node,
                         CAST(count(*) AS BIGINT) AS n
                  FROM codes GROUP BY 2),
           l3 AS (SELECT 'subsubclass' AS lvl,
                         str_split(code, '.')[1] || '.' ||
                         str_split(code, '.')[2] || '.' ||
                         str_split(code, '.')[3] AS node,
                         CAST(count(*) AS BIGINT) AS n
                  FROM codes GROUP BY 2)
      SELECT * FROM (SELECT * FROM l1 UNION ALL SELECT * FROM l2
                     UNION ALL SELECT * FROM l3)
      ORDER BY lvl, node"""))((s, dir) => {
      val c = codes(s, dir)
      val levels = Seq("class" -> 1, "subclass" -> 2, "subsubclass" -> 3)
        .map { case (name, n) =>
          c.groupBy(level(col("code"), n).as("node"))
            .agg(count(lit(1)).as("n"))
            .select(lit(name).as("lvl"), col("node"), col("n"))
        }
      levels.reduce(_.unionByName(_)).orderBy("lvl", "node")
    }),

    // Partial-code expansion ("7.2.-.-" → every concrete code under it) as
    // an EQUI-join on the extracted level columns — the scale path for C9
    // (a LIKE-prefix theta join would nested-loop at 100 TB; this hashes)
    RQ("ec2_partial_expand", Some("""
      WITH codes AS (SELECT DISTINCT
                       regexp_extract(p_brand, '#(\d+)', 1) || '.' ||
                       (p_size // 10) || '.' || (p_size % 10) || '.' ||
                       (p_partkey % 7) AS code
                     FROM part),
           partials AS (SELECT DISTINCT
                          str_split(code, '.')[1] AS q1,
                          str_split(code, '.')[2] AS q2
                        FROM codes
                        WHERE str_split(code, '.')[1] IN ('1', '2')),
      expanded AS (SELECT q1 || '.' || q2 || '.-.-' AS partial, code
                   FROM codes JOIN partials
                     ON str_split(code, '.')[1] = q1
                    AND str_split(code, '.')[2] = q2)
      SELECT partial, code FROM expanded ORDER BY partial, code"""))(
      (s, dir) => {
      val c = codes(s, dir).distinct()
        .withColumn("c1", element_at(split(col("code"), "\\."), 1))
        .withColumn("c2", element_at(split(col("code"), "\\."), 2))
      val partials = c.filter(col("c1").isin("1", "2"))
        .select(col("c1").as("q1"), col("c2").as("q2")).distinct()
      c.join(broadcast(partials),
          col("c1") === col("q1") && col("c2") === col("q2"))
        .select(concat(col("q1"), lit("."), col("q2"), lit(".-.-")).as("partial"),
          col("code"))
        .orderBy("partial", "code")
    })
  )
}

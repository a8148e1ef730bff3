package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import TextFunctions._
import VectorFunctions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  describe("TextFunctions") {
    it("shingles: 3-grams, distinct, empty when too short") {
      val df = Seq("a b c d", "a b").toDF("t")
        .select(shingles(split(col("t"), " "), 3).as("s"))
      val out = df.as[Seq[String]].collect()
      assert(out(0) === Seq("a b c", "b c d"))
      assert(out(1) === Seq.empty)
    }
    it("fingerprint: deterministic, 0 on empty input") {
      // ["a"] → 1 * (1*7 + 97) = 104
      val df = Seq("a", "").toDF("t")
        .select(fingerprint(when(col("t") =!= "", split(col("t"), " "))
          .otherwise(array().cast("array<string>"))).as("fp"))
      assert(df.as[Long].collect().toSeq === Seq(104L, 0L))
    }
    it("simhashBitTerm: nibble parity of the digest hex digit") {
      // md5("a") = 0cc175b9c0f1b6a831c399e269772661 ; digit1='0' even → -1,
      // digit3='c' (12) even → -1, digit4='1' odd → +1
      val df = Seq("a").toDF("t").select(md5(col("t").cast("binary")).as("dg"))
      val out = df.select(simhashBitTerm(col("dg"), 1).as("b1"),
        simhashBitTerm(col("dg"), 3).as("b3"),
        simhashBitTerm(col("dg"), 4).as("b4"))
        .as[(Long, Long, Long)].head()
      assert(out === ((-1L, -1L, 1L)))
    }
    it("simhashFromSums: bit b set iff sum >= 0") {
      val df = Seq(1).toDF("x")
      val v = df.select(simhashFromSums(Seq(lit(1L), lit(-1L), lit(0L))).as("v"))
        .as[Long].head()
      assert(v === (1L + 4L)) // bits 1 and 3
    }
    it("langId: argmax with earlier-profile tie preference") {
      val profiles = Seq("en" -> Seq("the"), "es" -> Seq("el"))
      val df = Seq("the cat", "el gato", "x y").toDF("t")
        .select(langId(split(col("t"), " "), profiles).as("l"))
      assert(df.as[String].collect().toSeq === Seq("en", "es", "en"))
    }
  }

  describe("url_encode (H9 viewer payloads)") {
    it("percent-encodes json payloads like apoc.text.urlencode") {
      val df = Seq(("a b", 3L)).toDF("s", "n")
        .select(url_encode(to_json(struct(col("s"), col("n")))).as("u"))
      assert(df.as[String].head() === "%7B%22s%22%3A%22a+b%22%2C%22n%22%3A3%7D")
    }
  }

  describe("VectorFunctions") {
    it("dot / norm / cosine on known vectors") {
      val df = Seq((Seq(3.0f, 4.0f), Seq(4.0f, 3.0f))).toDF("a", "b")
      val out = df.select(dot(col("a"), col("b")).as("d"),
        norm(col("a")).as("n"), cosine(col("a"), col("a")).as("c"))
        .as[(Double, Double, Double)].head()
      assert(out._1 === 24.0)
      assert(out._2 === 5.0)
      assert(math.abs(out._3 - 1.0) < 1e-12)
    }
    it("rpLshBucket: deterministic 8-bit key, equal vectors share buckets") {
      val df = Seq(Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f),
        Seq(-1.0f, -2.0f, -3.0f)).toDF("v")
        .select(rpLshBucket(col("v"), 8).as("b"))
      val out = df.as[String].collect()
      assert(out(0).length === 8 && out(0).matches("[01]{8}"))
      assert(out(0) === out(1))
      assert(out(2) !== out(0)) // negated vector flips every plane sign
    }
  }
}

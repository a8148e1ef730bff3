package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  describe("sampleFrames") {

    it("emits zero frames for payloads shorter than one frame") {
      val df = Seq(("short")).toDF("p")
        .select(col("p").cast("binary").as("p"))
      assert(Multimodal.sampleFrames(df, "p", 32, 64).count() === 0L)
    }

    it("emits floor((len - frame) / stride) + 1 frames for long payloads") {
      val df = Seq(("x" * 200)).toDF("p")
        .select(col("p").cast("binary").as("p"))
      // (200 - 32) / 64 = 2 (floor) → indices 0..2 → 3 frames
      val frames = Multimodal.sampleFrames(df, "p", 32, 64).collect()
      assert(frames.length === 3)
      assert(frames.map(_.getAs[Int]("frame_idx")).toSet === Set(0, 1, 2))
    }
  }
}

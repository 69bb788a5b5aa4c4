package graft

import org.apache.spark.sql.functions._

import graft.ann.HardNegatives

/** HardNegatives: hand-built geometry where the similarity order is
  * known exactly — same-label exclusion, the positive ceiling, the
  * semi-hard margin gate, and the anchor-without-positives edge.
  */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  /** Unit vectors in the plane at the given angle (degrees), padded to
    * 4 dims — cosine between rows is cos(angle difference), so ordering
    * is controlled exactly.
    */
  private def vec(deg: Double): Seq[Float] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r).toFloat, math.sin(r).toFloat, 0f, 0f)
  }

  // anchor 100 at 0°, label A. Positives (label A): 101 at 10°.
  // Negatives (label B): 200 at 5° (harder than the positive ceiling),
  // 201 at 20°, 202 at 40°, 203 at 80°.
  private val corpus = Seq(
    (100L, vec(0), "A"), (101L, vec(10), "A"),
    (200L, vec(5), "B"), (201L, vec(20), "B"),
    (202L, vec(40), "B"), (203L, vec(80), "B"))
  private def corpusDf = corpus.toDF("id", "vec", "label")
  private def anchorDf = corpus.filter(_._1 == 100L).toDF("id", "vec", "label")

  test("unmargined mining ranks negatives by similarity with the ceiling") {
    val out = HardNegatives.mine(corpusDf, "id", "vec", "label",
        anchorDf, "id", "vec", "label", k = 3)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(200L, 201L, 202L))
    val ceil = out.head.getAs[Double]("pos_ceiling")
    assert(math.abs(ceil - math.cos(math.toRadians(10))) < 1e-6)
  }

  test("the semi-hard margin drops negatives at or above ceiling - margin") {
    // ceiling = cos(10°) ≈ 0.985; margin 0.05 → keep sim < 0.935:
    // drops 200 (cos 5° ≈ 0.996) AND 201 (cos 20° ≈ 0.940)
    val out = HardNegatives.mine(corpusDf, "id", "vec", "label",
        anchorDf, "id", "vec", "label", k = 3, margin = Some(0.05))
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.map(_.getAs[Long]("id")).toSeq === Seq(202L, 203L))
  }

  test("an anchor with no positive gets ceiling -1 and no margin gate") {
    val lone = Seq((300L, vec(0), "C")).toDF("id", "vec", "label")
    val out = HardNegatives.mine(corpusDf, "id", "vec", "label",
        lone, "id", "vec", "label", k = 10)
      .collect()
    assert(out.forall(_.getAs[Double]("pos_ceiling") === -1.0))
    assert(out.length === 6) // every corpus doc is a negative
  }

  test("rank never exceeds k and is dense from 1 per anchor") {
    val anchors = corpus.filter(r => r._1 == 100L || r._1 == 200L)
      .toDF("id", "vec", "label")
    val out = HardNegatives.mine(corpusDf, "id", "vec", "label",
        anchors, "id", "vec", "label", k = 2)
      .collect()
    val byAnchor = out.groupBy(_.getAs[Long]("aid"))
    assert(byAnchor.keySet === Set(100L, 200L))
    byAnchor.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2))
    }
  }
}

package graft

import org.apache.spark.sql.functions.col
import graft.functions.SkillPoints
import graft.functions.SkillPoints.skill_points

/** Golden values for the skill-points formula (X1, FIXTURES.md §B),
  * computed independently from the closed form. Covers: v=10 -> 0 for all
  * skills, the negative-exponent path (v<10), NULL level -> 0 points
  * (`?? c` in the reference), and large-v values per constant family. */
class SkillPointsSpec extends SparkSpec {
  import spark.implicits._

  private val golden = Seq(
    // (skill, level, points)
    ("fist", 10L, 0L), ("fist", 20L, 3L), ("fist", 50L, 614296L),
    ("axe", 50L, 30541989660L), ("club", 50L, 30541989660L),
    ("sword", 20L, 28L), ("sword", 50L, 30541989660L),
    ("distance", 20L, 25L), ("distance", 50L, 27487790694L),
    ("shielding", 20L, 3L), ("shielding", 50L, 614296L),
    ("fishing", 10L, 0L), ("fishing", 20L, 0L), ("fishing", 50L, 7L), ("fishing", 100L, 885L),
    // negative-exponent path: floor of a small negative quotient
    ("fist", 8L, -1L), ("fishing", 8L, -1L))

  test("golden values via the codegen'd expression") {
    golden.groupBy(_._1).foreach { case (skill, cases) =>
      val df = cases.map(c => c._2).toDF("v")
        .select(col("v"), skill_points(col("v"), skill).as("p"))
      val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      cases.foreach { case (_, v, expect) =>
        assert(got(v) === expect, s"$skill($v)")
      }
    }
  }

  test("NULL level behaves as level 10 => 0 points") {
    val df = Seq[Option[Long]](None, Some(10L)).toDF("v")
      .select(skill_points(col("v"), "sword").as("p"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(0L, 0L))
  }

  test("scala helper matches expression for the whole golden set") {
    golden.foreach { case (skill, v, expect) =>
      assert(SkillPoints.points(skill, v) === expect, s"$skill($v)")
    }
  }

  test("IEEE-double closed form floors identically to exact rational arithmetic over v=10..49") {
    // The oracle gates skill_points with exact integer arithmetic; this is
    // the in-repo proof that the engine's double path (reference-faithful,
    // etl.dart:605) agrees with it everywhere in the query domain — i.e.
    // no exact value sits close enough to a floor boundary for double
    // rounding (or a 1-ulp pow difference) to flip the result. b = p/q;
    // points = floor((b^k−1)/(b−1)·a/d) = (a·q·(p^k−q^k)) / (d·(p−q)·q^k)
    // in BigInt — computed here with NO floating point.
    val rationals = Map(
      "fist" -> (3, 2), "axe" -> (2, 1), "club" -> (2, 1), "sword" -> (2, 1),
      "distance" -> (2, 1), "shielding" -> (3, 2), "fishing" -> (11, 10))
    for ((skill, (aD, bD, dD)) <- SkillPoints.constants; v <- 10L to 49L) {
      val (p, q) = rationals(skill)
      val k = (v - 10).toInt
      val a = BigInt(aD.toLong); val d = BigInt(dD.toLong)
      val num = a * q * (BigInt(p).pow(k) - BigInt(q).pow(k))
      val den = d * (p - q) * BigInt(q).pow(k)
      val exact = num / den // both positive: BigInt / == floor
      assert(SkillPoints.points(skill, v) === exact.toLong, s"$skill($v)")
    }
  }
}

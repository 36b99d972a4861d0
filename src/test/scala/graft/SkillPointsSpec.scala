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
}

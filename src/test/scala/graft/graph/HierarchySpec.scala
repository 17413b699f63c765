package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def flat(rows: Seq[(Long, Option[Long])]) =
    Hierarchy.flatten(rows.toDF("n", "p"), col("n"), col("p"))
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap

  test("flatten resolves a two-tree forest with exact roots and depths") {
    //       1            10
    //      / \            |
    //     2   3          11
    //         |
    //         4
    val out = flat(Seq(1L -> None, 2L -> Some(1L), 3L -> Some(1L),
      4L -> Some(3L), 10L -> None, 11L -> Some(10L)))
    assert(out(1L) == ((Some(1L), Some(0L))))
    assert(out(2L) == ((Some(1L), Some(1L))))
    assert(out(4L) == ((Some(1L), Some(2L))))
    assert(out(11L) == ((Some(10L), Some(1L))))
  }

  test("a 1000-deep chain resolves in logarithmic rounds") {
    val chain = (1L to 1000L).map(i => i -> (if (i == 1) None else Some(i - 1)))
    val out = flat(chain)
    assert(out(1000L) == ((Some(1L), Some(999L))))
    assert(out(500L) == ((Some(1L), Some(499L))))
  }

  test("cycles report null root instead of looping or throwing") {
    val out = flat(Seq(1L -> Some(2L), 2L -> Some(3L), 3L -> Some(1L), 9L -> None))
    assert(out(1L) == ((None, None)) && out(2L) == ((None, None)))
    assert(out(9L) == ((Some(9L), Some(0L))), "the clean row still resolves")
  }

  test("a dangling parent pointer is treated as the terminal root") {
    val out = flat(Seq(5L -> Some(99L), 6L -> Some(5L)))
    assert(out(5L) == ((Some(99L), Some(1L))), "the referenced unknown id is the root statement")
    assert(out(6L) == ((Some(99L), Some(2L))))
  }
}

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

  private def sub(rows: Seq[(Long, Option[Long], Double)]): Map[Long, (Long, Double)] =
    Hierarchy.subtreeAgg(rows.toDF("n", "p", "v"), col("n"), col("p"), col("v"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("subtreeAgg rolls every node's full subtree up, hand-checked") {
    //       1(10)            10(1)
    //      /    \              |
    //   2(20)  3(30)        11(2)
    //            |
    //          4(40)
    val out = sub(Seq((1L, None, 10.0), (2L, Some(1L), 20.0), (3L, Some(1L), 30.0),
      (4L, Some(3L), 40.0), (10L, None, 1.0), (11L, Some(10L), 2.0)))
    assert(out(1L) == ((4L, 100.0)))
    assert(out(3L) == ((2L, 70.0)))
    assert(out(2L) == ((1L, 20.0)))
    assert(out(10L) == ((2L, 3.0)))
  }

  test("subtreeAgg on a deep chain yields exact suffix sums in log rounds") {
    val n = 300L
    val chain = (1L to n).map(i => (i, if (i == 1) None else Some(i - 1), 1.0))
    val out = sub(chain)
    assert(out(1L) == ((n, n.toDouble)))
    assert(out(150L) == ((n - 149L, (n - 149L).toDouble)))
    assert(out(n) == ((1L, 1.0)))
  }

  test("subtreeAgg excludes cycle nodes and keeps the clean forest exact") {
    val out = sub(Seq((1L, Some(2L), 5.0), (2L, Some(1L), 7.0), // cycle
      (9L, None, 1.0), (10L, Some(9L), 2.0)))
    assert(!out.contains(1L) && !out.contains(2L), "cycle nodes must be absent, not wrong")
    assert(out(9L) == ((2L, 3.0)) && out(10L) == ((1L, 2.0)))
  }

  test("subtreeAgg under a dangling parent: members aggregate below, the phantom id has no row") {
    val out = sub(Seq((5L, Some(99L), 1.0), (6L, Some(5L), 2.0)))
    assert(out(5L) == ((2L, 3.0)))
    assert(out(6L) == ((1L, 2.0)))
    assert(!out.contains(99L))
  }
}

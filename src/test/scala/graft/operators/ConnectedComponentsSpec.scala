package graft.operators

import graft.SparkSuite

class ConnectedComponentsSpec extends SparkSuite {
  import spark.implicits._

  test("chain, clique, and singleton resolve to min-id components") {
    // chain 1-2-3-4 (diameter > 1), clique {10,11}, singleton 20
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val got = ConnectedComponents.run(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("direction of input edges does not matter") {
    val vertices = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((3L, 2L), (2L, 1L)).toDF("src", "dst") // all "backwards"
    val got = ConnectedComponents.run(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet === Set(1L))
  }

  test("long path converges within the iteration cap") {
    val n = 20L
    val vertices = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val got = ConnectedComponents.run(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(got.values.forall(_ == 1L))
  }
}

package graft

/** Bounded memo caches (VERDICT r9 task 4): LRU semantics, eviction
  * cleanup, and — the leak that motivated them — release of a
  * localCheckpointed DataFrame's executor blocks when a second corpus
  * context pushes the first out. */
class MemoSpec extends SparkTestBase {

  test("Bounded is an LRU: hits refresh recency, eviction calls onEvict") {
    var evicted = List.empty[Int]
    val m = new Memo.Bounded[String, Int](2, v => evicted ::= v)
    assert(m.getOrElseUpdate("a")(1) === 1)
    assert(m.getOrElseUpdate("b")(2) === 2)
    assert(m.getOrElseUpdate("a")(99) === 1) // hit — mk not evaluated
    assert(m.getOrElseUpdate("c")(3) === 3)  // b is now LRU: evicted
    assert(evicted === List(2))
    assert(m.get("b").isEmpty)
    assert(m.get("a").contains(1) && m.get("c").contains(3))
    assert(m.size === 2)
    m.clear()
    assert(m.size === 0 && evicted.toSet === Set(1, 2, 3))
  }

  test("evicting a checkpointed DataFrame releases its executor blocks") {
    val sc = spark.sparkContext
    def persisted = sc.getPersistentRDDs.keySet
    val m = new Memo.Bounded[Int, org.apache.spark.sql.DataFrame](
      1, Memo.releaseLocalCheckpoint)
    val before = persisted
    m.getOrElseUpdate(1)(spark.range(100).toDF("id").localCheckpoint())
    val firstBlocks = persisted -- before
    assert(firstBlocks.nonEmpty, "localCheckpoint should persist an RDD")
    // a second corpus context arrives: the first entry must be evicted
    // AND its checkpoint blocks released (the round-9 unbounded-leak fix)
    val second = m.getOrElseUpdate(2)(
      spark.range(50).toDF("id").localCheckpoint())
    assert((persisted & firstBlocks).isEmpty,
      "evicted entry's checkpoint RDD must be unpersisted")
    assert(second.count() === 50L, "surviving entry still serves reads")
    m.clear()
  }
}

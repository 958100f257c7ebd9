package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, QuaternaryExpression, SpecificInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** The hot-shingle escape hatch for the Σ df² pair stream (VERDICT r6
  * task 2): [[OrderedPairs]] emits every pair of ONE grouped posting list
  * from ONE generator call, i.e. one task — a web-scale stop-word shingle
  * (df 10⁴–10⁶) serializes its whole df² emission into a single straggler.
  * `block_split` cuts the SORTED posting list into ⌈df/cap⌉ contiguous
  * blocks and emits one row per block pair (b1 ≤ b2): the intra rows carry
  * one block as the left side, the cross rows carry both blocks. After a
  * repartition on (key, b1, b2) those rows land on DIFFERENT tasks, and
  * [[BlockPairs]] turns each into its pair stream — ordered pairs of the
  * left block when the right side is empty, the full left × right product
  * otherwise. Because blocks are contiguous slices of the sorted list,
  * every cross pair is already ordered (max(left) < min(right)), so the
  * union over bucket rows is EXACTLY the i < j pair multiset of the
  * original list — same contract as OrderedPairs, now bounded at ~cap²
  * pairs per task.
  *
  * Costs, honestly: one extra exchange (the bucket rows; O(df·⌈df/cap⌉)
  * entries per key, i.e. ~1× the posting volume while df ≤ cap) and an
  * O(df·⌈df/cap⌉) slice materialization per key. For df ≤ cap the split
  * degenerates to a single intra row — the stream is byte-equivalent to
  * the OrderedPairs formulation plus the repartition. The replication
  * factor ⌈df/cap⌉ grows linearly in df, so a df far beyond the cap
  * (stop-word shingles at web scale) should still be prefix-filtered or
  * df-capped upstream — this kernel removes the single-task ceiling, not
  * the Σ df² work itself.
  */
case class BlockSplit(child: Expression, cap: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(cap >= 2, s"block_split cap must be >= 2, got $cap")

  override def prettyName: String = "block_split"

  private val arr = (n: String) => StructField(n, ArrayType(LongType, containsNull = false), nullable = false)

  override def elementSchema: StructType = StructType(Seq(
    StructField("b1", IntegerType, nullable = false),
    StructField("b2", IntegerType, nullable = false),
    arr("l_id"), arr("l_n"), arr("r_id"), arr("r_n")))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == LongType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"block_split requires array<struct<long,long>>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val ids = new Array[Long](n)
    val ns = new Array[Long](n)
    var k = 0
    while (k < n) {
      val st = arr.getStruct(k, 2)
      ids(k) = st.getLong(0)
      ns(k) = st.getLong(1)
      k += 1
    }
    val nblk = (n + cap - 1) / cap
    def blockSlice(a: Array[Long], b: Int): UnsafeArrayData =
      UnsafeArrayData.fromPrimitiveArray(
        java.util.Arrays.copyOfRange(a, b * cap, math.min(n, (b + 1) * cap)))
    val empty = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    new Iterator[InternalRow] {
      private var b1 = 0
      private var b2 = 0
      override def hasNext: Boolean = b1 < nblk
      override def next(): InternalRow = {
        val r =
          if (b1 == b2) // intra block: left side only
            new GenericInternalRow(Array[Any](
              b1, b2, blockSlice(ids, b1), blockSlice(ns, b1), empty, empty))
          else // cross block: all of left precedes all of right
            new GenericInternalRow(Array[Any](
              b1, b2, blockSlice(ids, b1), blockSlice(ns, b1), blockSlice(ids, b2), blockSlice(ns, b2)))
        b2 += 1
        if (b2 >= nblk) { b1 += 1; b2 = b1 }
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BlockSplit =
    copy(child = newChild)
}

/** Pair emitter for one [[BlockSplit]] bucket row: ordered (i < j) pairs
  * of the left block when the right side is empty, the left × right
  * product otherwise (already ordered by construction — see BlockSplit).
  * Same reused-mutable-row emission and whole-stage `doGenCode` as
  * [[OrderedPairs]]; per-bucket work is bounded by ~cap² pairs. */
case class BlockPairs(lid: Expression, ln: Expression,
    rid: Expression, rn: Expression)
    extends QuaternaryExpression with Generator {

  override def prettyName: String = "block_pairs"

  override def first: Expression = lid
  override def second: Expression = ln
  override def third: Expression = rid
  override def fourth: Expression = rn

  override def elementSchema: StructType = StructType(Seq(
    StructField("id1", LongType, nullable = false),
    StructField("n1", LongType, nullable = false),
    StructField("id2", LongType, nullable = false),
    StructField("n2", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"block_pairs requires four array<long> inputs, got " +
        children.map(_.dataType.catalogString).mkString(", "))

  /** Shared by eval and generated code; public for Janino. */
  def pairIterator(lidA: ArrayData, lnA: ArrayData,
      ridA: ArrayData, rnA: ArrayData): Iterator[InternalRow] = {
    if (lidA == null || lnA == null) return Iterator.empty
    val lids = lidA.toLongArray()
    val lns = lnA.toLongArray()
    val rids = if (ridA == null) Array.emptyLongArray else ridA.toLongArray()
    val rns = if (rnA == null) Array.emptyLongArray else rnA.toLongArray()
    val row = new SpecificInternalRow(Seq(LongType, LongType, LongType, LongType))
    if (rids.isEmpty) { // intra block: ordered i < j pairs
      val n = lids.length
      if (n < 2) return Iterator.empty
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = i < n - 1
        override def next(): InternalRow = {
          row.setLong(0, lids(i)); row.setLong(1, lns(i))
          row.setLong(2, lids(j)); row.setLong(3, lns(j))
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
          row
        }
      }
    } else { // cross block: full product, each pair emitted ORDERED
      // Contiguous rank blocks (the BlockSplit path) satisfy
      // all-left < all-right, so the swap below never fires there; hash
      // subgroups (the df-join kernel path) interleave, so pairs are
      // ordered at emission by the (id, n) struct order — one compare
      // per pair, preserving the i < j multiset contract either way.
      val n = lids.length
      val m = rids.length
      if (n == 0 || m == 0) return Iterator.empty
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 0
        override def hasNext: Boolean = i < n
        override def next(): InternalRow = {
          val flip = lids(i) > rids(j) ||
            (lids(i) == rids(j) && lns(i) > rns(j))
          if (flip) {
            row.setLong(0, rids(j)); row.setLong(1, rns(j))
            row.setLong(2, lids(i)); row.setLong(3, lns(i))
          } else {
            row.setLong(0, lids(i)); row.setLong(1, lns(i))
            row.setLong(2, rids(j)); row.setLong(3, rns(j))
          }
          j += 1
          if (j >= m) { i += 1; j = 0 }
          row
        }
      }
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] =
    pairIterator(
      lid.eval(input).asInstanceOf[ArrayData],
      ln.eval(input).asInstanceOf[ArrayData],
      rid.eval(input).asInstanceOf[ArrayData],
      rn.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val ref = ctx.addReferenceObj("blockPairs", this)
    val iter = ctx.freshName("blockPairsIter")
    val args = gens.map(g => s"${g.isNull} ? null : ${g.value}").mkString(", ")
    ev.copy(
      code = code"""
        |${gens.map(_.code).reduce(_ + _)}
        |scala.collection.Iterator<InternalRow> $iter = $ref.pairIterator($args);
        |""".stripMargin,
      isNull = FalseLiteral,
      value = JavaCode.variable(iter, classOf[Iterator[InternalRow]]))
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): BlockPairs =
    BlockPairs(newFirst, newSecond, newThird, newFourth)
}

object BlockedPairs {
  def block_split(c: Column, cap: Int): Column =
    ColumnBridge.column(BlockSplit(ColumnBridge.expression(c), cap))
  def block_pairs(lid: Column, ln: Column, rid: Column, rn: Column): Column =
    ColumnBridge.column(BlockPairs(
      ColumnBridge.expression(lid), ColumnBridge.expression(ln),
      ColumnBridge.expression(rid), ColumnBridge.expression(rn)))
}

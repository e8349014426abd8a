package graft.plans

import graft.detect.{KeyedFold, RawScored, SeriesKernel}
import graft.model.TsSample
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, HashPartitioning, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator Catalyst integration of the keyed sequential fold
  * (SURVEY §4.2 recurrences: EMA, derivative, …) — the (c)-tier custom
  * operator from the builder brief: LogicalPlan + SparkStrategy +
  * SparkPlan, injectable via SparkSessionExtensions.
  *
  * Why a physical operator instead of the repartition→sortWithinPartitions
  * →mapPartitions composition (KeyedFold.foldOn): the composition
  * HARD-CODES its data movement — `repartition` always shuffles, even when
  * the input is already hash-distributed on the key (bucketed layout, an
  * upstream aggregation, a reused exchange). Declaring the requirement
  * instead (`requiredChildDistribution` = ClusteredDistribution(key),
  * `requiredChildOrdering` = (key, ts)) hands the decision to
  * EnsureRequirements: Catalyst inserts the exchange/sort only when the
  * child does not already satisfy them, reuses exchanges across subtrees,
  * and AQE can re-plan the inserted exchange at runtime. At 100 TB over a
  * bucket-by-key table this is the difference between shuffling the fact
  * table every run and zero data movement — without the caller having to
  * KNOW the layout (KeyedFold.foldPrePartitioned makes the caller assert
  * it; this node makes Catalyst PROVE it).
  *
  * The fold itself is the same single-pass bounded-state kernel run
  * (KeyedFold.run); only the planning of its input moved into Catalyst.
  */
object KeyedFoldPlan {

  /** Output schema of the fold: RawScored as attributes. Fresh exprIds per
    * call — attributes are carried in the node so optimizer copies keep
    * them stable.
    */
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("seriesKey", StringType, nullable = false)(),
    AttributeReference("tsMs", LongType, nullable = false)(),
    AttributeReference("value", DoubleType, nullable = false)(),
    AttributeReference("dev", DoubleType, nullable = false)())

  /** Idempotently install the strategy into a session's runtime planner —
    * works on ANY session (including the driver's vanilla one), no
    * config-time extensions required. GraftExtensions also injects it for
    * the `spark.sql.extensions` path.
    */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[KeyedFoldStrategy.type]))
      spark.experimental.extraStrategies = cur :+ KeyedFoldStrategy
  }
}

/** Logical fold node. `child` must produce exactly
  * (seriesKey: String, tsMs: Long, value: Double) in that order.
  */
final case class KeyedFoldNode(
    mkKernel: () => SeriesKernel,
    override val output: Seq[Attribute],
    child: LogicalPlan)
  extends UnaryNode {
  // the fold reads every child column and emits a new attribute set
  override def references: AttributeSet = child.outputSet
  override def producedAttributes: AttributeSet = outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): KeyedFoldNode =
    copy(child = newChild)
}

/** Physical fold. Declares its input requirements and lets
  * EnsureRequirements plan (or elide) the exchange and sort.
  */
final case class KeyedFoldExec(
    mkKernel: () => SeriesKernel,
    override val output: Seq[Attribute],
    child: SparkPlan)
  extends UnaryExecNode {

  private def keyAttr: Attribute = child.output.head
  private def tsAttr: Attribute = child.output(1)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(keyAttr)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(keyAttr, Ascending), SortOrder(tsAttr, Ascending)))

  // one input key-group maps to one output key-group in place: the child's
  // hash distribution on the key survives, re-expressed over our output
  // attribute so downstream per-key operators skip their shuffle too
  override def outputPartitioning: Partitioning = child.outputPartitioning match {
    case h: HashPartitioning if h.expressions == Seq(keyAttr) =>
      HashPartitioning(Seq(output.head), h.numPartitions)
    case other => other
  }

  // rows leave the kernel in (key, ts) order within each partition
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(output.head, Ascending), SortOrder(output(1), Ascending))

  override def producedAttributes: AttributeSet = AttributeSet(output)

  override protected def doExecute(): RDD[InternalRow] = {
    val mk = mkKernel
    child.execute().mapPartitions({ it =>
      val proj = UnsafeProjection.create(
        Array[org.apache.spark.sql.types.DataType](StringType, LongType, DoubleType, DoubleType))
      val samples = it.map { r =>
        // getUTF8String points into a reused row buffer; toString copies
        TsSample(r.getUTF8String(0).toString, r.getLong(1), r.getDouble(2))
      }
      KeyedFold.run[TsSample, RawScored, String](samples, _.seriesKey, mk).map { o =>
        proj(InternalRow(UTF8String.fromString(o.seriesKey), o.tsMs, o.value, o.dev))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): KeyedFoldExec =
    copy(child = newChild)
}

/** Planner strategy: KeyedFoldNode → KeyedFoldExec. */
object KeyedFoldStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case KeyedFoldNode(mk, out, child) => KeyedFoldExec(mk, out, planLater(child)) :: Nil
    case _ => Nil
  }
}

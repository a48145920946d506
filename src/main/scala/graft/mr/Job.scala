package graft.mr

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions.col

/** JsMr-shaped MapReduce facade (SURVEY.md §3.2 E3), covering the
  * reference's R1–R10 surface on typed Datasets:
  *
  *  - R1 input split/scan: [[Job.text]]/[[Job.parquet]] — file partitions
  *    are the splits; [[Job.of]] wraps any Dataset.
  *  - R2 map: [[Job.map]]/[[Job.flatMap]]/[[Job.mapPartitions]] — Scala
  *    lambdas, no serialization wall to a foreign runtime.
  *  - R3 combiner: automatic — [[KeyedJob.reduceByKey]] lowers to an
  *    `Aggregator`-based typed aggregation, which Spark plans as
  *    partial (map-side) + final aggregation; the user never writes a
  *    combiner, exactly as the MapReduce paper's optional combine fn.
  *  - R4 partition/shuffle: implicit in the groupByKey exchange (hash on
  *    key, like MR's hash(k) mod R); [[KeyedJob.partitionBy]] exposes an
  *    explicit repartition when the user wants to pick R.
  *  - R5 reduce: [[KeyedJob.reduceByKey]] (monoid fold) and
  *    [[KeyedJob.groupReduce]] (general per-key iterator, 0..n outputs).
  *  - R6 sort: [[KeyedJob.sortByKey]] — range-partitioned total order.
  *  - R7 output: [[Job.save]]/[[Job.collect]].
  *  - R8 chaining: a Job wraps a lazy Dataset, so chained jobs compose into
  *    ONE Catalyst plan — no materialization boundary between "jobs" unless
  *    [[Job.materialize]] is called (the explicit barrier).
  *  - R9 fault tolerance: free (Spark task retry / speculative execution).
  *  - R10 UDF surface: the lambdas above.
  */
final class Job[T] private[mr] (val ds: Dataset[T]) {

  def map[U: Encoder](f: T => U): Job[U] = new Job(ds.map(f))

  def flatMap[U: Encoder](f: T => IterableOnce[U]): Job[U] =
    new Job(ds.flatMap(x => f(x).iterator))

  def filter(p: T => Boolean): Job[T] = new Job(ds.filter(p))

  def mapPartitions[U: Encoder](f: Iterator[T] => Iterator[U]): Job[U] =
    new Job(ds.mapPartitions(f))

  /** Key the records — the (k2, v2) emission step of the MR model. */
  def keyBy[K: Encoder](f: T => K)(implicit kv: Encoder[(K, T)]): KeyedJob[K, T] =
    new KeyedJob(ds.map(x => (f(x), x)))

  /** Treat an already-paired job as keyed. */
  def pairs[K, V](implicit ev: T <:< (K, V), e: Encoder[(K, V)]): KeyedJob[K, V] =
    new KeyedJob(ds.map(ev(_)))

  /** Explicit materialization barrier between chained jobs (R8). Without it
    * chained jobs stay one logical plan and Catalyst optimizes across the
    * job boundary. */
  def materialize(): Job[T] = new Job(ds.cache())

  def collect(): Array[T] = ds.collect()

  def save(path: String, format: String = "parquet"): Unit =
    ds.write.format(format).mode("overwrite").save(path)

  def toDS: Dataset[T] = ds
}

final class KeyedJob[K, V] private[mr] (val ds: Dataset[(K, V)]) {

  /** Per-key monoid fold — MR reduce with an automatic combiner (R3+R5):
    * the Aggregator lowers to partial+final aggregation, so `f` runs
    * map-side first, exactly like the paper's combine fn. `f` must be
    * associative (the MR contract). */
  def reduceByKey(f: (V, V) => V)(implicit kv: Encoder[(K, V)], k: Encoder[K], v: Encoder[V]): KeyedJob[K, V] =
    new KeyedJob(
      ds.groupByKey(_._1)
        .mapValues(_._2)
        .reduceGroups(f)
        .map(identity))

  /** General per-key reduce: full value iterator, 0..n outputs (R5). No
    * map-side combine — use [[reduceByKey]] when the fold is associative. */
  def groupReduce[U: Encoder](f: (K, Iterator[V]) => IterableOnce[U])(implicit k: Encoder[K]): Job[U] =
    new Job(ds.groupByKey(_._1).flatMapGroups((key, it) => f(key, it.map(_._2)).iterator))

  /** Secondary sort (the MR composite-key + grouping-comparator idiom,
    * MR-paper §4.2): the reducer's value iterator arrives ordered by
    * `sortKey` WITHOUT the reducer — or this facade — ever sorting a group
    * in memory. Physical shape: repartition on the key, sort WITHIN
    * partitions on (key, sortKey) (Spark's spillable external sort — the
    * framework's disk-backed sort, exactly as in MR), then one sequential
    * pass walks the key runs and streams each run's values to `f`.
    * Memory per task is O(1) in group size, vs [[groupReduce]]'s
    * per-group iterator which Spark may buffer. */
  def groupReduceSorted[S, U: Encoder](sortKey: V => S)(
      f: (K, Iterator[V]) => IterableOnce[U])(
      implicit ksv: Encoder[(K, S, V)]): Job[U] = {
    val sorted = ds.map { case (key, v) => (key, sortKey(v), v) }
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"))
    // Key-run boundary equality: VALUE equality, including (nested) array
    // keys — `Array[Byte]` digests are natural MR keys but `==` on JVM
    // arrays is referential, which would make every row its own run and
    // silently invoke the reducer many times per key. (A local def, not a
    // class member: the task closure must not capture `this`.) Keys whose
    // type hides arrays where `Objects.deepEquals` cannot see them (an
    // Array FIELD inside a case-class key) still need value-equality
    // semantics of their own. (A lambda VAL, not a def: a nested def lifts
    // to an instance method and drags `this` into the task closure.)
    val keyEq: (Any, Any) => Boolean =
      (a, b) => java.util.Objects.deepEquals(
        a.asInstanceOf[AnyRef], b.asInstanceOf[AnyRef])
    new Job(sorted.mapPartitions { rows =>
      val buf = rows.buffered
      new Iterator[U] {
        private var cur: Iterator[U] = Iterator.empty
        private var drainRun: () => Unit = () => ()
        def hasNext: Boolean = {
          while (!cur.hasNext && { drainRun(); buf.hasNext }) {
            val key = buf.head._1
            val run: Iterator[V] = new Iterator[V] {
              def hasNext: Boolean = buf.hasNext && keyEq(buf.head._1, key)
              def next(): V = buf.next()._3
            }
            drainRun = () => while (run.hasNext) run.next()
            cur = f(key, run).iterator
          }
          cur.hasNext
        }
        def next(): U = { if (!hasNext) throw new NoSuchElementException; cur.next() }
      }
    })
  }

  /** Total order by key across partitions (R6) — range partition + sort,
    * the distributed-sort guarantee of MR's ordered reduce output. */
  def sortByKey(ascending: Boolean = true): Job[(K, V)] =
    new Job(ds.orderBy(if (ascending) col("_1").asc else col("_1").desc))

  /** Explicit choice of R (number of reduce partitions), hash on key. */
  def partitionBy(numPartitions: Int): KeyedJob[K, V] =
    new KeyedJob(ds.repartition(numPartitions, col("_1")))

  def collect(): Array[(K, V)] = ds.collect()

  def save(path: String, format: String = "parquet"): Unit =
    ds.write.format(format).mode("overwrite").save(path)

  def toDS: Dataset[(K, V)] = ds
}

object Job {

  /** R1 — line-oriented text input; one record per line, file splits =
    * partitions. */
  def text(spark: SparkSession, path: String): Job[String] =
    new Job(spark.read.textFile(path))

  /** R1 — typed parquet input. */
  def parquet[T: Encoder](spark: SparkSession, path: String): Job[T] =
    new Job(spark.read.parquet(path).as[T])

  /** Wrap any Dataset (e.g. a catalog table projected to the fields the
    * map fn needs). */
  def of[T](ds: Dataset[T]): Job[T] = new Job(ds)
}

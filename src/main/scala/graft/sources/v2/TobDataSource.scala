package graft.sources.v2

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Tob

/** DataSource V2 for Campbell TOB1/TOB3 binary files:
  * `spark.read.format("tob").load(dir)`.
  *
  * SURVEY §7.3's second phase-2 item (the frame decoder inside a
  * `PartitionReader`). Schema comes from a driver-side header probe of
  * the first file (~4 KB); each file is one partition (a fast-data
  * site-day is many daily files — parallelism with no shuffle); the
  * frame/record decode runs inside the partition reader, reusing the
  * tested [[graft.sources.Tob]] decoders (validation stamps, minor
  * frames, FP2 NaN -> null). Column pruning happens at row
  * materialization — fixed-width binary decode is IO-bound, so the
  * win is skipping per-cell conversion and row width, not bytes read.
  */
class TobDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tob"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TobV2.fullSchema(Toa5V2.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new TobTable(schema, properties.get("path"))
}

private[v2] class TobTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"tob:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TobScanBuilder(tableSchema, Toa5V2.pathOf(options))
}

private[v2] class TobScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new TobScan(path, fullSchema, required)
}

private[v2] class TobScan(path: String, fullSchema: StructType,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Toa5V2.listFiles(path)
      .map(f => Toa5InputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new TobReaderFactory(fullSchema, required)
}

private[v2] class TobReaderFactory(fullSchema: StructType,
    required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TobPartitionReader(
      partition.asInstanceOf[Toa5InputPartition].file, fullSchema, required)
}

/** Frame decode to InternalRow with required-column pruning. The file
  * BYTES are read whole (one logger day — bounded per task); the ROWS
  * stream frame-by-frame whenever the frame order already satisfies
  * the record-number contract, so live heap per task is one frame,
  * not one file's boxed rows. */
private[v2] class TobPartitionReader(file: String,
    fullSchema: StructType, required: StructType)
    extends PartitionReader[InternalRow] {
  private val rows: Iterator[org.apache.spark.sql.Row] = {
    val bytes = Files.readAllBytes(Paths.get(file))
    val (fh, _) = Tob.parseHeader(bytes)
    // the scan's schema came from a single probe file: a file whose
    // own header disagrees would mis-bind columns — fail loudly.
    // Names + types must match exactly; a user-declared schema
    // (external metadata) may differ in metadata, but must not
    // declare non-nullable where the decoder can emit null (FP2 NaN
    // -> null) — codegen would read garbage instead of failing.
    val own = Tob.sparkSchema(fh)
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    require(shape(own) == shape(fullSchema),
      s"TOB header mismatch in $file: decoded schema $own differs " +
      s"from probed/declared $fullSchema — decode a homogeneous directory")
    own.fields.zip(fullSchema.fields).foreach { case (o, d) =>
      require(d.nullable || !o.nullable,
        s"declared schema marks ${d.name} non-nullable but the TOB " +
        s"decoder can emit nulls for it in $file")
    }
    // TOB3 streams frame-by-frame when valid frames are already in
    // record order (the normal closed-out daily file — checked from
    // frame headers alone): O(one frame) live memory per task
    // instead of the whole file's boxed row set, which at 32
    // concurrent day-file readers is the difference between KBs and
    // GBs of old-gen pressure. Ring-buffer wraps (out-of-order
    // frames) take the materialize+sort path, preserving the
    // record-number order contract exactly.
    if (fh.format == "TOB1") Tob.decodeTob1Rows(bytes)._1
    else if (Tob.tob3FramesInOrder(bytes)) Tob.decodeTob3Rows(bytes)._1
    else Tob.decodeTob3(bytes)._1.iterator
  }
  // decode rows are in full-schema field order
  private val srcIdx: Array[Int] =
    required.fields.map(f => fullSchema.fieldIndex(f.name))

  private var current: InternalRow = _

  override def next(): Boolean =
    if (!rows.hasNext) false
    else {
      val r = rows.next()
      val out = new GenericInternalRow(srcIdx.length)
      var i = 0
      while (i < srcIdx.length) {
        val v = r.get(srcIdx(i))
        out.update(i, v match {
          case null => null
          case s: String => UTF8String.fromString(s)
          case other => other   // us-long timestamp + primitives as-is
        })
        i += 1
      }
      current = out
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

private[v2] object TobV2 {
  /** Driver-side probe: header lives in the first few hundred bytes. */
  def fullSchema(path: String): StructType = {
    val first = Toa5V2.listFiles(path).head
    val head = new Array[Byte](4096)
    val in = Files.newInputStream(Paths.get(first))
    val n = try in.readNBytes(head, 0, head.length) finally in.close()
    val (h, _) = Tob.parseHeader(java.util.Arrays.copyOf(head, n))
    Tob.sparkSchema(h)
  }
}

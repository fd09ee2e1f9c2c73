package graft.ivf

import java.net.URI

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.ColumnDescriptor
import org.apache.parquet.column.impl.ColumnReadStoreImpl
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.{Binary, Converter, GroupConverter, PrimitiveConverter}
import org.apache.parquet.schema.{GroupType, MessageType, PrimitiveType, Type}

/** Selective single-column vector fetch — the Spark-side analog of the
  * reference's `read_embeddings_for_rows` (`/root/reference/src/ivf/
  * search.rs:155-244`): given a file and a set of candidate row ordinals,
  * read ONLY the embedding column and ONLY the row groups that contain
  * candidates (`ParquetFileReader.skipNextRowGroup` for the rest — the
  * reference's `ParquetAccessPlan::new_none`/`skip` shape,
  * `src/df_vector/access.rs:107-159`). IO is proportional to probed row
  * groups × one column chunk, not to file size × row width.
  *
  * The reference additionally skips PAGES inside a selected group via
  * `RowSelection` over 1-row pages; parquet-java reads whole column chunks
  * per group, so this path is row-group granular within the chunk (decode
  * cost, not IO layout, is the residual delta — documented in README's
  * roadmap).
  *
  * Null vectors, null elements, and dim-mismatched rows yield no output row
  * (the engine-wide skip-don't-error semantics). f64 embedding columns are
  * downcast to f32, like the reference (`src/ivf/parquet.rs:287-291`).
  */
object SelectiveFetch {

  private def toLocal(file: String): String =
    Try(new URI(file)).toOption match {
      case Some(u) if u.getScheme == "file" => u.getPath
      case _ => file
    }

  /** Leaf column descriptor + projected schema for an `array<float/double>`
    * column written in the standard 3-level LIST layout.
    */
  private def project(schema: MessageType, column: String): (MessageType, ColumnDescriptor) = {
    val fieldIdx = schema.getFieldIndex(column)
    require(fieldIdx >= 0, s"column '$column' not in schema")
    val projected = new MessageType(schema.getName, schema.getType(fieldIdx))
    val cols = projected.getColumns.asScala
    require(
      cols.size == 1,
      s"column '$column' is not a single-leaf list column (leaves: ${cols.size})")
    (projected, cols.head)
  }

  /** No-op converter tree matching an arbitrary projected schema (the
    * low-level ColumnReader API requires one; values are read directly off
    * the reader, parquet-tools' dump does the same).
    */
  private def noopConverter(t: Type): Converter = t match {
    case g: GroupType =>
      val children = g.getFields.asScala.map(noopConverter).toArray
      new GroupConverter {
        override def getConverter(i: Int): Converter = children(i)
        override def start(): Unit = ()
        override def end(): Unit = ()
      }
    case _: PrimitiveType =>
      new PrimitiveConverter {
        override def addBinary(v: Binary): Unit = ()
        override def addBoolean(v: Boolean): Unit = ()
        override def addDouble(v: Double): Unit = ()
        override def addFloat(v: Float): Unit = ()
        override def addInt(v: Int): Unit = ()
        override def addLong(v: Long): Unit = ()
      }
  }

  /** Read the vectors at `ordinals` (file-absolute row ordinals, any order)
    * from `file`'s `column`. Returns (ordinal, vector) pairs, ordinal
    * ascending; rows whose vector is null/contains nulls are omitted.
    */
  def embeddings(
      file: String, column: String, ordinals: Array[Int]): Seq[(Long, Array[Float])] = {
    if (ordinals.isEmpty) return Seq.empty
    val sorted = ordinals.distinct.sorted
    val out = new ArrayBuffer[(Long, Array[Float])](sorted.length)

    val inputFile = HadoopInputFile.fromPath(new Path(toLocal(file)), new Configuration())
    val reader = ParquetFileReader.open(inputFile)
    try {
      val footer = reader.getFooter
      val (projected, desc) = project(footer.getFileMetaData.getSchema, column)
      reader.setRequestedSchema(projected)
      val isDouble =
        desc.getPrimitiveType.getPrimitiveTypeName ==
          PrimitiveType.PrimitiveTypeName.DOUBLE
      val maxDef = desc.getMaxDefinitionLevel
      val converter = noopConverter(projected).asInstanceOf[GroupConverter]
      val createdBy = footer.getFileMetaData.getCreatedBy

      var groupStart = 0L // first ordinal of the current row group
      var ci = 0 // cursor into sorted ordinals
      val blocks = footer.getBlocks.asScala
      blocks.foreach { block =>
        val rows = block.getRowCount
        val groupEnd = groupStart + rows
        // advance past ordinals below this group (defensive; sorted input)
        while (ci < sorted.length && sorted(ci) < groupStart) ci += 1
        val hasCandidates = ci < sorted.length && sorted(ci) < groupEnd
        if (!hasCandidates) {
          reader.skipNextRowGroup(): Unit
        } else {
          val pages = reader.readNextRowGroup()
          val store = new ColumnReadStoreImpl(pages, converter, projected, createdBy)
          val cr = store.getColumnReader(desc)
          var remaining = cr.getTotalValueCount
          var record = groupStart // ordinal of the record being assembled
          val buf = new ArrayBuffer[Float]()
          var valid = true
          var started = false
          def emit(): Unit = {
            if (started) {
              if (valid && ci < sorted.length && sorted(ci) == record) {
                out += ((record, buf.toArray))
              }
              while (ci < sorted.length && sorted(ci) <= record) ci += 1
              record += 1
            }
          }
          while (remaining > 0) {
            if (cr.getCurrentRepetitionLevel == 0) {
              emit()
              started = true
              buf.clear()
              valid = true
            }
            if (cr.getCurrentDefinitionLevel == maxDef) {
              buf += (if (isDouble) cr.getDouble.toFloat else cr.getFloat)
            } else {
              // null list, empty list, or null element → skip the row
              valid = false
            }
            cr.consume()
            remaining -= 1
          }
          emit() // last record of the group
        }
        groupStart = groupEnd
      }
    } finally reader.close()
    out.toSeq
  }
}

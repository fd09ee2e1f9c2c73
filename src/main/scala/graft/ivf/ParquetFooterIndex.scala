package graft.ivf

import java.io.RandomAccessFile
import java.net.URI

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Read path for indexes embedded INSIDE a Parquet file, the reference's
  * native layout (`/root/reference/src/ivf/parquet.rs:105-208`): the index
  * payload (magic `PQ_VECTOR1` + u64 LE length + bytes) sits after the data
  * pages, and the footer key-value metadata records
  * `pq_vector_index_offset` (byte offset of the magic) and
  * `pq_vector_embedding_column`. Files indexed by the reference engine are
  * therefore directly queryable by this engine.
  */
object ParquetFooterIndex {

  private def toLocalFile(file: String): String = {
    val uri = Try(new URI(file)).toOption
    uri match {
      case Some(u) if u.getScheme == "file" => u.getPath
      case Some(u) if u.getScheme == null => file
      case _ => file
    }
  }

  /** Footer KV lookup: (index byte offset, embedding column) if present. */
  def indexMetadata(file: String): Option[(Long, String)] = {
    val inputFile = HadoopInputFile.fromPath(new Path(file), new Configuration())
    val reader = ParquetFileReader.open(inputFile)
    try {
      val kv = reader.getFooter.getFileMetaData.getKeyValueMetaData.asScala
      for {
        off <- kv.get(IvfIndex.IndexOffsetKey).flatMap(s => Try(s.toLong).toOption)
        column <- kv.get(IvfIndex.EmbeddingColumnKey)
      } yield (off, column)
    } finally reader.close()
  }

  def hasIndex(file: String): Boolean = indexMetadata(file).isDefined

  /** Load the embedded index if this file carries one for `column`. */
  def load(file: String, column: String): Option[IvfIndex] =
    indexMetadata(file).collect {
      case (offset, indexedColumn) if indexedColumn == column =>
        val local = toLocalFile(file)
        val raf = new RandomAccessFile(local, "r")
        try {
          require(
            offset >= 0 && offset < raf.length(),
            s"index offset $offset out of bounds for $file (len ${raf.length()})")
          raf.seek(offset)
          val framed = new Array[Byte]((raf.length() - offset).toInt)
          raf.readFully(framed)
          IvfIndex.unframe(framed)
        } finally raf.close()
    }
}

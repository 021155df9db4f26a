package graft.sources.hdf5

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Distributed HDF5 sink: one granule FILE per partition, numeric
  * columns as 1-D datasets in a single group — the write-side shape
  * of real ICESat-2 archives (one .h5 per granule; HDF5 files cannot
  * be appended in parallel, so file-per-task is the correct
  * distributed layout, mirroring how the reference's own campaign
  * data arrives as thousands of independent granules).
  *
  * Together with [[Hdf5DataSource]] this closes the loop: a frame
  * written here scans back through `.format("hdf5")` with one split
  * per (file, group) — the s5_hdf5_sink_roundtrip oracle hash-matches
  * that round trip. Granules are written through the Hadoop
  * FileSystem API to a hidden `.part` path and renamed into place on
  * success, so (a) on a real cluster the files land on the shared
  * filesystem (HDFS/S3A), not executor-local disk, and (b) a retried
  * or speculative task never exposes a half-written granule to a
  * concurrent reader — the loser of the rename race deletes and
  * re-promotes deterministically identical bytes.
  *
  * Supported column types: double/float/long/int/short/byte scalars
  * (the numeric-telemetry shape of granule groups). Empty partitions
  * write no file.
  */
object Hdf5Sink {

  def write(df: DataFrame, dir: String, group: String = "data",
      deflate: Option[Int] = Some(6), chunkRows: Int = 65536,
      filePrefix: String = "part"): Unit = {
    val schema = df.schema
    schema.fields.foreach { f =>
      require(dtypeOf(f.dataType).nonEmpty,
        s"${f.name}: ${f.dataType} unsupported (numeric scalars only)")
    }
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val hadoopConf = df.sparkSession.sessionState.newHadoopConf()
    dirPath.getFileSystem(hadoopConf).mkdirs(dirPath)
    // ship the SESSION Hadoop conf to executors — a bare
    // `new Configuration()` there drops session-configured filesystem
    // settings (fs.s3a credentials/endpoints), so executor writes
    // could resolve a different filesystem than the driver's mkdirs
    val confKv: Array[(String, String)] = {
      val it = hadoopConf.iterator()
      val b = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.toArray
    }
    val names = schema.fields.map(_.name)
    val types = schema.fields.map(f => dtypeOf(f.dataType).get)
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val bufs = types.map {
          case "f64" => new scala.collection.mutable.ArrayBuilder.ofDouble
          case "f32" => new scala.collection.mutable.ArrayBuilder.ofFloat
          case "i64" => new scala.collection.mutable.ArrayBuilder.ofLong
          case "i32" => new scala.collection.mutable.ArrayBuilder.ofInt
          case "i16" => new scala.collection.mutable.ArrayBuilder.ofShort
          case _     => new scala.collection.mutable.ArrayBuilder.ofByte
        }
        var n = 0
        rows.foreach { r =>
          var c = 0
          while (c < types.length) {
            (bufs(c), types(c)) match {
              case (b: scala.collection.mutable.ArrayBuilder.ofDouble, _) => b += r.getDouble(c)
              case (b: scala.collection.mutable.ArrayBuilder.ofFloat, _)  => b += r.getFloat(c)
              case (b: scala.collection.mutable.ArrayBuilder.ofLong, _)   => b += r.getLong(c)
              case (b: scala.collection.mutable.ArrayBuilder.ofInt, _)    => b += r.getInt(c)
              case (b: scala.collection.mutable.ArrayBuilder.ofShort, _)  => b += r.getShort(c)
              case (b: scala.collection.mutable.ArrayBuilder.ofByte, _)   => b += r.getByte(c)
            }
            c += 1
          }
          n += 1
        }
        val dsets = names.indices.map { c =>
          val (dtype, bytes) = (bufs(c), types(c)) match {
            case (b: scala.collection.mutable.ArrayBuilder.ofDouble, t) => t -> Hdf5Writer.f64Bytes(b.result())
            case (b: scala.collection.mutable.ArrayBuilder.ofFloat, t)  => t -> Hdf5Writer.f32Bytes(b.result())
            case (b: scala.collection.mutable.ArrayBuilder.ofLong, t)   => t -> Hdf5Writer.i64Bytes(b.result())
            case (b: scala.collection.mutable.ArrayBuilder.ofInt, t)    => t -> Hdf5Writer.i32Bytes(b.result())
            case (b: scala.collection.mutable.ArrayBuilder.ofShort, t) =>
              val a = b.result()
              val bb = java.nio.ByteBuffer.allocate(a.length * 2)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              a.foreach(bb.putShort); t -> bb.array()
            case (b: scala.collection.mutable.ArrayBuilder.ofByte, t)   => t -> b.result()
          }
          Hdf5Writer.Dset(names(c), dtype, Seq(n), bytes,
            chunkDims = deflate.map(_ => Seq(math.min(chunkRows, n))),
            deflate = deflate)
        }
        val bytes = Hdf5Writer.fileBytes(Seq(Hdf5Writer.Group(group, dsets)))
        // temp + rename through the Hadoop FS (same atomic-promote
        // shape as CachedFetch): a concurrent reader only ever sees
        // complete granules, and a task retry re-promotes identical
        // bytes instead of truncating a file mid-scan
        val target = new org.apache.hadoop.fs.Path(f"$dir/$filePrefix-$pid%05d.h5")
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confKv.foreach { case (k, v) => conf.set(k, v) }
        val fs = target.getFileSystem(conf)
        val tmp = new org.apache.hadoop.fs.Path(target.getParent,
          s".${target.getName}.${java.util.UUID.randomUUID()}.part")
        val out = fs.create(tmp, true)
        try out.write(bytes) finally out.close()
        if (!fs.rename(tmp, target)) {
          // dest exists from a prior attempt of this deterministic
          // partition: replace it
          fs.delete(target, false)
          if (!fs.rename(tmp, target))
            throw new java.io.IOException(s"Hdf5Sink: cannot promote $tmp to $target")
        }
      }
    }
  }

  private def dtypeOf(t: DataType): Option[String] = t match {
    case DoubleType  => Some("f64")
    case FloatType   => Some("f32")
    case LongType    => Some("i64")
    case IntegerType => Some("i32")
    case ShortType   => Some("i16")
    case ByteType    => Some("i8")
    case _           => None
  }
}

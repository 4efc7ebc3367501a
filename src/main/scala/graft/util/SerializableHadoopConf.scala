package graft.util

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop Configuration (the same shape as
  * Spark's own internal SerializableConfiguration, which is not public API):
  * executor-side closures that resolve store paths must use the SESSION's
  * Hadoop configuration, not `new Configuration()` — on any filesystem
  * needing non-default conf (S3A credentials, HDFS settings) the default
  * conf would misroute or fail.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

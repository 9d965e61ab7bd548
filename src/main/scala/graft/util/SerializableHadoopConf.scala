package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop `Configuration` (which is
  * `Writable` but not `Serializable`), so executor-side code can
  * resolve `FileSystem`s with the JOB's conf — scheme impls,
  * credentials, tuning — instead of a default `new Configuration()`
  * that silently drops all session settings on a real deployment.
  * Same shape as Spark's own (spark-private) wrapper: the conf
  * travels through its Writable write/readFields.
  */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** A Hadoop `Configuration` that survives a Spark closure. Hadoop's
  * `Configuration` is not `java.io.Serializable`, so a task closure that
  * needs filesystem access on the executor must either rebuild one from
  * the executor's classpath site files — which silently drops every
  * `spark.hadoop.*` session setting (object-store credentials, endpoint
  * overrides, `fs.*.impl` bindings) — or carry the driver's resolved
  * conf across the wire. This wrapper does the latter via Hadoop's own
  * `write`/`readFields` wire format (the same trick as Spark's internal
  * `SerializableConfiguration`, which is `private[spark]`).
  *
  * Build it from `spark.sessionState.newHadoopConf()` on the driver so
  * the session's `spark.hadoop.*` entries are already merged in. */
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

package org.apache.spark.deploy

import org.apache.spark.SparkConf
import org.apache.spark.rpc.RpcEnv

/** Test-only bridge into the `private[deploy]` standalone-cluster
  * bootstrap (same minimal-shim pattern as plans/SparkShims.scala): start
  * a Master and Workers PROGRAMMATICALLY with chosen bind hosts. Spark's
  * own `local-cluster[n,c,m]` master hardcodes every worker onto one
  * hostname, which is exactly what the multi-host speculation differential
  * must escape — binding workers to distinct loopback aliases
  * (127.0.0.2/3) gives the TaskSetManager genuinely different host
  * strings on one machine. RpcEnv is `private[spark]`, so handles are
  * opaque to callers outside this package. */
object GraftDeployShims {

  /** Opaque process-group handle (RpcEnv is private[spark]). */
  final class ClusterHandle private[deploy] (envs: Seq[RpcEnv]) {
    def shutdown(): Unit = envs.foreach { e =>
      e.shutdown(); e.awaitTermination()
    }
  }

  /** Starts a Master on `masterHost` and one Worker per entry of
    * `workerHosts` (each offering `cores`/`memMb`, executor processes
    * advertising that host). Returns (masterUrl, handle). */
  def startCluster(
      masterHost: String,
      workerHosts: Seq[String],
      cores: Int,
      memMb: Int,
      workDirRoot: String): (String, ClusterHandle) = {
    val (masterEnv, _, _) =
      master.Master.startRpcEnvAndEndpoint(masterHost, 0, 0, new SparkConf())
    val masterUrl = s"spark://$masterHost:${masterEnv.address.port}"
    val workerEnvs = workerHosts.zipWithIndex.map { case (host, i) =>
      worker.Worker.startRpcEnvAndEndpoint(
        host, 0, 0, cores, memMb, Array(masterUrl), s"$workDirRoot/mh$i",
        Some(i), new SparkConf(), None)
    }
    // workers first on shutdown, master last
    (masterUrl, new ClusterHandle(workerEnvs :+ masterEnv))
  }

  /** Executor-chaos bridge (`getExecutorIds` / `killAndReplaceExecutor`
    * are `private[spark]`): enumerate live executors and kill one the way
    * a lost node would — its cached blocks and shuffle files are gone,
    * while the app's executor target stays so the master backfills. */
  def executorIds(sc: org.apache.spark.SparkContext): Seq[String] =
    sc.getExecutorIds()

  def killAndReplaceExecutor(sc: org.apache.spark.SparkContext, id: String): Boolean =
    sc.killAndReplaceExecutor(id)
}

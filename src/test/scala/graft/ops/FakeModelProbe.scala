package graft.ops

import java.util.concurrent.atomic.AtomicInteger

/** Instrumented fake embedding model for the decodeAndFeaturize
  * session-lifecycle spec: counts opens/closes/batches via JVM-static
  * atomics (valid in local mode - executor lambdas share the JVM) and
  * embeds each payload's length as the feature vector so the spec can
  * prove real values flowed through the session in order.
  */
object FakeModelProbe {
  val opened = new AtomicInteger(0)
  val closed = new AtomicInteger(0)
  val batches = new AtomicInteger(0)
  val maxBatch = new AtomicInteger(0)

  def reset(): Unit = {
    opened.set(0); closed.set(0); batches.set(0); maxBatch.set(0)
  }

  class Model extends MultimodalOps.FeatureModel {
    def openSession(): MultimodalOps.FeatureSession = {
      opened.incrementAndGet()
      new MultimodalOps.FeatureSession {
        def embedBatch(payloads: Array[Array[Byte]]): Array[Array[Float]] = {
          batches.incrementAndGet()
          maxBatch.getAndAccumulate(payloads.length, math.max)
          payloads.map(p => Array(if (p == null) -1f else p.length.toFloat, 0f))
        }
        def close(): Unit = closed.incrementAndGet()
      }
    }
  }
}

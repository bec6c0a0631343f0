package graft.som

/** Learning-rate / sigma schedules. Reference: `decays.py:4-65`. Both
  * eta and sigma decay with the same rule each epoch (`xpysom.py:541-543`).
  */
sealed trait Decay extends Serializable {
  def apply(val0: Double, valN: Double, t: Int, maxIter: Int): Double
  def name: String
}

object Decay {
  /** `decays.py:46-65` */
  case object Linear extends Decay {
    val name = "linear"
    def apply(val0: Double, valN: Double, t: Int, maxIter: Int): Double =
      if (maxIter != 1) val0 + (valN - val0) * t / (maxIter - 1).toDouble else val0
  }

  /** `decays.py:23-43` */
  case object Exponential extends Decay {
    val name = "exponential"
    def apply(val0: Double, valN: Double, t: Int, maxIter: Int): Double = {
      val diff =
        if (valN == 0) -math.log(0.1) / maxIter
        else -math.log(valN / val0) / maxIter
      val0 * math.exp(-t * diff)
    }
  }

  /** `decays.py:4-20` (valN ignored) */
  case object Asymptotic extends Decay {
    val name = "asymptotic"
    def apply(val0: Double, valN: Double, t: Int, maxIter: Int): Double =
      val0 / (1 + 2.0 * t / maxIter)
  }

  val all: Map[String, Decay] =
    Seq(Exponential, Asymptotic, Linear).map(d => d.name -> d).toMap

  def apply(name: String): Decay = all.getOrElse(name, {
    // xpysom.py:217-220
    throw new IllegalArgumentException(
      s"$name not supported. Functions available: ${all.keys.mkString(", ")}")
  })
}

package graft.tools

/** Dev probe: raw single-thread cost of the hot scan-stage UDFs, outside
  * Spark — separates "the UDF is expensive" from "the stage is slow". */
object UdfMicrobench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    // warm
    (0 until 200).foreach { i =>
      val png = graft.data.Multimodal.gradientPng(i.toLong, 0)
      graft.data.Multimodal.dHash56(png)
    }
    var t0 = System.nanoTime()
    val pngs = (0 until n).map(i => graft.data.Multimodal.gradientPng(i.toLong, i % 4))
    val tGen = (System.nanoTime() - t0) / 1e6
    t0 = System.nanoTime()
    pngs.foreach(graft.data.Multimodal.dHash56)
    val tHash = (System.nanoTime() - t0) / 1e6
    println(f"n=$n gradientPng ${tGen}%.0f ms (${tGen / n}%.3f ms/img), " +
      f"dHash56 ${tHash}%.0f ms (${tHash / n}%.3f ms/img)")
  }
}

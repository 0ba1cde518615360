package graft.tools

import graft.sources.Zstd

/** Zstd codec micro-bench (dev tool): encode/decode MB/s and ratio on two
  * representative payloads — token-ish text (the Kafka/event shape) and a
  * repetitive log shape. Prints one line per (payload, direction).
  * Usage: runMain graft.tools.ZstdBench [sizeMb]
  */
object ZstdBench {
  def main(args: Array[String]): Unit = {
    val mb = args.headOption.map(_.toInt).getOrElse(16)
    val n = mb * (1 << 20)
    def textish(sz: Int): Array[Byte] = {
      val words = Array("the", "quick", "brown", "fox", "jumps", "over",
        "lazy", "dogs", "user_id", "event", "purchase", "12345", "{\"k\":")
      val sb = new StringBuilder(sz + 16)
      var s = 42L
      while (sb.length < sz) {
        s = s * 6364136223846793005L + 1442695040888963407L
        sb.append(words(((s >>> 33) % words.length).toInt)).append(' ')
      }
      sb.toString.take(sz).getBytes("UTF-8")
    }
    def loggy(sz: Int): Array[Byte] = {
      val sb = new StringBuilder(sz + 64)
      var i = 0L
      while (sb.length < sz) {
        sb.append(s"2026-08-15T18:00:${i % 60} INFO request id=${i % 1000} status=200 path=/api/v1/events\n")
        i += 1
      }
      sb.toString.take(sz).getBytes("UTF-8")
    }
    for ((name, data) <- Seq("text" -> textish(n), "log" -> loggy(n))) {
      // warm
      val c0 = Zstd.compress(data); Zstd.decompress(c0)
      var t = System.nanoTime()
      val c = Zstd.compress(data)
      val encS = (System.nanoTime() - t) / 1e9
      t = System.nanoTime()
      val d = Zstd.decompress(c)
      val decS = (System.nanoTime() - t) / 1e9
      require(java.util.Arrays.equals(d, data))
      val mbF = data.length / 1048576.0
      println(f"$name%s size=${mbF}%.1fMB ratio=${data.length.toDouble / c.length}%.2fx " +
        f"enc=${mbF / encS}%.0f MB/s dec=${mbF / decS}%.0f MB/s")
    }
  }
}

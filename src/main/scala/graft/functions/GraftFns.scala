package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** The library's LLM-ops scalar extensions exposed by NAME through the
  * session `FunctionRegistry` — the Spark-side analog of the reference's
  * extension registry (`ScalarFunctionExecutor` registration,
  * expression_parser_complex.rs:188-277): once registered, plain
  * `spark.sql` AND every GraftApp SQL expression can call the custom
  * Catalyst expressions (codegen'd, no UDFs) that power the curation
  * operators:
  *
  *   token_count(text)            — whitespace-token count (LONG)
  *   rolling_hash64(text)         — polynomial rolling fingerprint (LONG)
  *   nfc_normalize(text)          — Unicode NFC canonical composition
  *   word_shingles(text, n)       — word n-gram array (n a literal)
  *   sorted_jaccard(a, b)         — exact Jaccard of two sorted token arrays
  *   minhash_sig(tokens, k)       — k-slot MinHash signature (k a literal)
  *   simhash64(tokens)            — 64-bit SimHash fingerprint
  *   cosine_sim(a, b)             — float-vector cosine (DOUBLE)
  *   cosine_q(a, b)               — exact quantized (long-vector) cosine
  *   html_to_text(html)           — WET-style HTML boilerplate strip
  *   url_canon(url)               — URL canonicalization (tracking params…)
  *   url_domain(url)              — frequency-capping domain key
  *   deflate_len(text)            — zlib-compressed byte length (quality signal)
  *   zorder_key(d1[, d2…], bits)  — Morton-interleaved layout key (LONG)
  *
  * None of the names shadows a Spark builtin, so registration is permanent
  * per session (same WeakHashMap latch discipline as [[RefFns.register]]).
  * Bad arity / non-literal size parameters raise immediately at analysis
  * with the offending name, not from codegen.
  */
object GraftFns {

  private type Builder = Seq[Expression] => Expression

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${args.length}")

  private def litInt(name: String, e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$name: $what must be an integer literal")
  }

  private[graft] val builders: Seq[(String, Builder)] = Seq(
    "token_count" -> { args =>
      arity("token_count", args, 1)
      Cast(RegExpCount(args.head, Literal("\\S+")), LongType)
    },
    "rolling_hash64" -> { args =>
      arity("rolling_hash64", args, 1)
      RollingHash64(Cast(args.head, StringType))
    },
    "nfc_normalize" -> { args =>
      arity("nfc_normalize", args, 1)
      NfcNormalize(Cast(args.head, StringType))
    },
    "word_shingles" -> { args =>
      arity("word_shingles", args, 2)
      WordShingles(args.head, litInt("word_shingles", args(1), "shingle width"))
    },
    "sorted_jaccard" -> { args =>
      arity("sorted_jaccard", args, 2)
      SortedJaccard(args.head, args(1))
    },
    "minhash_sig" -> { args =>
      arity("minhash_sig", args, 2)
      MinHashSig(args.head, litInt("minhash_sig", args(1), "signature size"))
    },
    "simhash64" -> { args =>
      arity("simhash64", args, 1)
      SimHash64(args.head)
    },
    "cosine_sim" -> { args =>
      arity("cosine_sim", args, 2)
      CosineSimilarity(args.head, args(1))
    },
    "cosine_q" -> { args =>
      arity("cosine_q", args, 2)
      QuantizedCosine(args.head, args(1))
    },
    // Round-8 curation compositions, registered through the SAME
    // definitions the DataFrame operators use (Bridge converts the Column
    // chain — a by-name call and a Curation.* call cannot diverge):
    "html_to_text" -> { args =>
      arity("html_to_text", args, 1)
      expr0(graft.operators.Curation.htmlToText(col0(Cast(args.head, StringType))))
    },
    "url_canon" -> { args =>
      arity("url_canon", args, 1)
      expr0(graft.operators.Curation.canonicalizeUrl(col0(Cast(args.head, StringType))))
    },
    "url_domain" -> { args =>
      arity("url_domain", args, 1)
      expr0(graft.operators.Curation.urlDomain(col0(Cast(args.head, StringType))))
    },
    "deflate_len" -> { args =>
      arity("deflate_len", args, 1)
      DeflateLen(Cast(args.head, StringType))
    },
    // Round-10 layout key, same definition the Layout operator uses:
    // zorder_key(dim1[, dim2, ...], bits) — Morton-interleaved LONG over
    // already-bucketed non-negative dims (bits a literal, n*bits <= 63)
    "zorder_key" -> { args =>
      if (args.length < 2) throw new IllegalArgumentException(
        "zorder_key expects (dim1[, dim2, ...], bits literal)")
      val bits = litInt("zorder_key", args.last, "bits")
      expr0(graft.operators.Layout.zValue(args.init.map(col0), bits))
    })

  private def col0(e: Expression) =
    org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def expr0(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftbridge.Bridge.convertedExpression(c)

  private val installed =
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()

  def register(spark: SparkSession): Unit = installed.synchronized {
    if (installed.containsKey(spark)) return
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
    installed.put(spark, java.lang.Boolean.TRUE)
  }
}

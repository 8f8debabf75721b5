package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Offline trainer for the BPE merge table shipped in
  * `src/main/resources/graft/bpe/merges.txt` (A7 — the vocab-file seam,
  * reference utils/token_counter.py:19-110: its primary path is tiktoken
  * with a pretrained vocab; no vocab ships in this sandbox, so the table
  * is FIT here from scratch with the classic BPE procedure — Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units" — on the sf0.001 synthetic corpus).
  *
  * Training corpus: the letter/number cores of the GPT-2-style
  * pre-tokenizer pieces ([[graft.operators.TextAnalysis.BpePattern]],
  * one optional leading space stripped), weighted by frequency. Each
  * round counts adjacent symbol pairs over the weighted vocab, merges
  * the most frequent pair (ties broken lexicographically — fully
  * deterministic), and repeats for [[NumMerges]] rounds. Symbols never
  * contain whitespace, so the "left right" line format is unambiguous.
  *
  * Rerunning `sbt "Test/runMain graft.tools.TrainBpe"` reproduces the
  * shipped file bit for bit. The inference algorithm that CONSUMES this
  * table (TextAnalysis.bpeMergeCount: repeatedly merge the leftmost
  * lowest-rank adjacent pair) is mirrored exactly by the q60 DuckDB
  * oracle; a compression sanity check is asserted before writing. */
object TrainBpe {

  val NumMerges = 300

  /** Merge every non-overlapping occurrence of `pair`, left to right
    * (the training-side vocab update; inference replays merges by rank,
    * which need not mirror this exactly — only the rank table ships).
    * Delegates to the engine-shared
    * [[graft.operators.TextAnalysis.mergeAdjacent]] so the local and
    * distributed trainers provably share one update rule. */
  private def mergeAll(syms: Vector[String], pair: (String, String)): Vector[String] =
    graft.operators.TextAnalysis.mergeAdjacent(syms, pair._1, pair._2).toVector

  /** The classic local merge loop over a weighted word-core vocab —
    * callable from specs so `TextAnalysis.bpeTrain` (the distributed
    * twin) can be pinned merge-for-merge against it. */
  def train(freq: collection.Map[String, Long], numMerges: Int): Vector[(String, String)] = {
    var vocab: Map[Vector[String], Long] =
      freq.toSeq.groupBy(_._1.map(_.toString).toVector)
        .map { case (syms, ws) => syms -> ws.map(_._2).sum }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val pairCounts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        pairCounts((syms(i), syms(i + 1))) += f
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) round = numMerges
      else {
        val best = candidates.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.toSeq.map { case (syms, f) => mergeAll(syms, best) -> f }
          .groupBy(_._1).map { case (s, ws) => s -> ws.map(_._2).sum }
        round += 1
      }
    }
    merges.toVector
  }

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("train-bpe").getOrCreate()
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    spark.stop()

    val pieceRe = graft.operators.TextAnalysis.BpePattern.r
    val coreRe = "^[\\p{L}\\p{N}]+$".r
    val freq = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (t <- texts; piece <- pieceRe.findAllIn(t)) {
      val core = if (piece.startsWith(" ")) piece.substring(1) else piece
      if (coreRe.findFirstIn(core).isDefined) freq(core) += 1
    }
    println(s"[train-bpe] ${texts.length} docs, ${freq.size} distinct word cores")

    val merges = train(freq, NumMerges)
    println(s"[train-bpe] ${merges.length} merges learned")

    // sanity: the merge table must genuinely compress — the weighted
    // mean tokens-per-word under the INFERENCE algorithm vs raw chars
    val ranks = merges.zipWithIndex.map { case ((a, b), i) => s"$a $b" -> (i + 1) }.toMap
    val rawChars = freq.map { case (w, f) => w.length.toLong * f }.sum.toDouble
    val bpeToks = freq.map { case (w, f) =>
      graft.operators.TextAnalysis.bpeMergeCount(w, ranks).toLong * f
    }.sum.toDouble
    val compression = bpeToks / rawChars
    println(f"[train-bpe] tokens/chars = $compression%.3f (lower = more merging)")
    assert(compression < 0.5, s"merge table barely compresses: $compression")

    val out = Paths.get("src/main/resources/graft/bpe/merges.txt")
    Files.createDirectories(out.getParent)
    Files.write(out,
      merges.map { case (a, b) => s"$a $b" }.mkString("\n").getBytes(StandardCharsets.UTF_8))
    println(s"[train-bpe] wrote ${out.toAbsolutePath}")
  }
}

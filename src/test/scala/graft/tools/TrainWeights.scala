package graft.tools

import graft.pipeline.HashedBow
import java.io.{BufferedOutputStream, DataOutputStream, File, FileOutputStream}

/** Offline trainer for the frozen weight tensors shipped in
  * `src/main/resources/graft/weights/` (K8/K9 — the "real model" seam,
  * reference rag/encode/MiniLM.py + rag/rerank/MiniLM.py).
  *
  * No model runtime exists in this environment, so instead of importing
  * weights we FIT them here, from scratch, on public knowledge only: a
  * small common-English synonym lexicon (the kind found in any
  * thesaurus) expanded into sentence pairs. Positive pairs share meaning
  * through DIFFERENT surface tokens (synonym-swapped, independent filler
  * words), negative pairs share fillers but no meaning — so the only way
  * to separate them is to learn which hash buckets are synonymous, i.e.
  * genuine (tiny) semantic representation learning. A hash kernel
  * cannot express this: it embeds "car" and "automobile" orthogonally
  * forever.
  *
  * Two models are fit with plain SGD (no deps):
  *  - encoder: W[64×256] over [[HashedBow.raw]] features, trained
  *    siamese-contrastive on s = Σᵢ tanh(Wfₐ)ᵢ·tanh(W f_b)ᵢ / dim with
  *    hinge margins (pull positives above 0.6, push negatives below
  *    0.15). Inference (RandomProjectionEncoder) L2-normalizes the same
  *    forward, which preserves the learned ordering.
  *  - cross-encoder: two-layer MLP (w1[32×384], w2[32]) over the joint
  *    feature [f_q ; f_c ; f_q⊙f_c], hinge on the logit at ±1 —
  *    the pairwise-relevance objective of a reranker.
  *
  * Deterministic end to end (fixed RNG seeds, fixed lexicon) — rerunning
  * `sbt "Test/runMain graft.tools.TrainWeights"` reproduces the shipped
  * files bit for bit. Held-out pair-ranking accuracy is printed at the
  * end and asserted ≥ 0.95 so a bad refactor of the featurizer can't
  * silently ship broken tensors. */
object TrainWeights {

  // public-knowledge synonym lexicon: common-English thesaurus groups
  val groups: Array[Array[String]] = Array(
    Array("car", "automobile", "vehicle"),
    Array("fast", "quick", "rapid", "speedy"),
    Array("big", "large", "huge", "enormous"),
    Array("small", "tiny", "little"),
    Array("happy", "glad", "joyful", "cheerful"),
    Array("sad", "unhappy", "sorrowful"),
    Array("begin", "start", "commence"),
    Array("end", "finish", "conclude"),
    Array("buy", "purchase", "acquire"),
    Array("house", "home", "residence"),
    Array("doctor", "physician", "medic"),
    Array("illness", "sickness", "disease"),
    Array("job", "occupation", "profession"),
    Array("money", "cash", "currency"),
    Array("smart", "intelligent", "clever"),
    Array("foolish", "silly", "unwise"),
    Array("beautiful", "pretty", "lovely"),
    Array("cold", "chilly", "freezing"),
    Array("hot", "scorching", "heated"),
    Array("street", "road", "avenue"),
    Array("child", "kid", "youngster"),
    Array("ocean", "sea", "deep"),
    Array("forest", "woods", "woodland"),
    Array("talk", "speak", "converse"),
    Array("walk", "stroll", "amble"),
    Array("run", "sprint", "dash"),
    Array("eat", "consume", "devour"),
    Array("look", "watch", "observe"),
    Array("make", "create", "build"),
    Array("destroy", "demolish", "wreck"),
    Array("old", "ancient", "aged"),
    Array("new", "modern", "recent"),
    Array("weather", "climate", "conditions"),
    Array("ship", "boat", "vessel"),
    Array("storm", "tempest", "squall"))

  val fillers: Array[String] =
    "the a an of to in on with and or very quite really just then now here there so but".split(" ")

  final case class Pair(a: String, b: String, positive: Boolean)

  private def sentence(rnd: java.util.Random, gs: Seq[Int]): String = {
    val words = gs.map(g => groups(g)(rnd.nextInt(groups(g).length))) ++
      Seq.fill(3)(fillers(rnd.nextInt(fillers.length)))
    scala.util.Random.javaRandomToRandom(rnd).shuffle(words).mkString(" ")
  }

  /** n pairs, alternating positive (same 3 synonym groups, different
    * draws) and negative (disjoint groups). */
  def pairs(rnd: java.util.Random, n: Int): IndexedSeq[Pair] =
    (0 until n).map { i =>
      val gs = rnd.ints(0, groups.length).distinct().limit(6).toArray
      if (i % 2 == 0) Pair(sentence(rnd, gs.take(3).toSeq), sentence(rnd, gs.take(3).toSeq), true)
      else Pair(sentence(rnd, gs.take(3).toSeq), sentence(rnd, gs.drop(3).toSeq), false)
    }

  // ---- encoder ----

  val EncDim = graft.pipeline.Schemas.EmbeddingDim // 64
  val EncFeatDim = 256
  val EncSeed = 42 // MUST match RandomProjectionEncoder's hash seed

  def trainEncoder(train: IndexedSeq[Pair]): Array[Array[Float]] = {
    val rnd = new java.util.Random(1L)
    val w = Array.fill(EncDim, EncFeatDim)(
      (rnd.nextGaussian() / math.sqrt(EncFeatDim)).toFloat)
    val lr = 0.5f
    val (mPos, mNeg) = (0.6, 0.15)
    for (_ <- 1 to 30; p <- train) {
      val fa = HashedBow.raw(p.a, EncFeatDim, EncSeed)
      val fb = HashedBow.raw(p.b, EncFeatDim, EncSeed)
      val ta = new Array[Double](EncDim); val tb = new Array[Double](EncDim)
      var s = 0.0
      var i = 0
      while (i < EncDim) {
        var aa = 0.0; var bb = 0.0
        val row = w(i)
        var j = 0
        while (j < EncFeatDim) { aa += row(j) * fa(j); bb += row(j) * fb(j); j += 1 }
        ta(i) = math.tanh(aa); tb(i) = math.tanh(bb)
        s += ta(i) * tb(i)
        i += 1
      }
      s /= EncDim
      // hinge: positives pulled above mPos, negatives pushed below mNeg
      val g = if (p.positive && s < mPos) -1.0 else if (!p.positive && s > mNeg) 1.0 else 0.0
      if (g != 0.0) {
        i = 0
        while (i < EncDim) {
          val row = w(i)
          val da = (1 - ta(i) * ta(i)) * tb(i) / EncDim
          val db = ta(i) * (1 - tb(i) * tb(i)) / EncDim
          var j = 0
          while (j < EncFeatDim) {
            val grad = da * fa(j) + db * fb(j)
            if (grad != 0.0) row(j) = (row(j) - lr * g * grad).toFloat
            j += 1
          }
          i += 1
        }
      }
    }
    w
  }

  def encScore(w: Array[Array[Float]], a: String, b: String): Double = {
    val fa = HashedBow.raw(a, EncFeatDim, EncSeed)
    val fb = HashedBow.raw(b, EncFeatDim, EncSeed)
    var s = 0.0
    for (i <- 0 until EncDim) {
      var aa = 0.0; var bb = 0.0
      for (j <- 0 until EncFeatDim) { aa += w(i)(j) * fa(j); bb += w(i)(j) * fb(j) }
      s += math.tanh(aa) * math.tanh(bb)
    }
    s / EncDim
  }

  // ---- cross-encoder ----

  val CrossProjDim = EncDim // P = the bi-encoder's trained projection
  val CrossHidden = 64

  /** Fit the MLP head over the FROZEN trained encoder projection P=encW
    * (pretrained body + task head): joint = [p(q);p(c);p(q)⊙p(c);1]. */
  def trainCross(encW: Array[Array[Float]], train: IndexedSeq[Pair])
      : (Array[Array[Float]], Array[Float]) = {
    val rnd = new java.util.Random(2L)
    val w1 = Array.fill(CrossHidden, 3 * CrossProjDim + 1)(
      (rnd.nextGaussian() / math.sqrt(3.0 * CrossProjDim)).toFloat)
    val w2 = Array.fill(CrossHidden)(
      (rnd.nextGaussian() / math.sqrt(CrossHidden.toDouble)).toFloat)
    for (epoch <- 1 to 40; p <- train) {
      val lr = 0.1 / (1.0 + epoch / 20.0)
      val joint = jointFeat(encW, p.a, p.b)
      val th = new Array[Double](CrossHidden)
      var s = 0.0
      var i = 0
      while (i < CrossHidden) {
        var acc = 0.0
        val row = w1(i)
        var k = 0
        while (k < joint.length) { acc += row(k) * joint(k); k += 1 }
        th(i) = math.tanh(acc)
        s += w2(i) * th(i)
        i += 1
      }
      // hinge on the logit: positives above +1, negatives below -1
      val g = if (p.positive && s < 1) -1.0 else if (!p.positive && s > -1) 1.0 else 0.0
      if (g != 0.0) {
        i = 0
        while (i < CrossHidden) {
          val dh = g * w2(i) * (1 - th(i) * th(i))
          w2(i) = (w2(i) - lr * g * th(i)).toFloat
          val row = w1(i)
          var k = 0
          while (k < joint.length) {
            if (joint(k) != 0f) row(k) = (row(k) - lr * dh * joint(k)).toFloat
            k += 1
          }
          i += 1
        }
      }
    }
    (w1, w2)
  }

  /** p(text) = tanh(encW · hashedBow(text)) — mirrors
    * ProjectionCrossEncoder.proj with P = the trained encoder. */
  def projFeat(encW: Array[Array[Float]], text: String): Array[Float] = {
    val f = HashedBow.raw(text, EncFeatDim, EncSeed)
    Array.tabulate(CrossProjDim) { i =>
      math.tanh((0 until EncFeatDim).map(j => encW(i)(j).toDouble * f(j)).sum).toFloat
    }
  }

  /** MUST mirror ProjectionCrossEncoder.score's joint feature:
    * [p(q) ; p(c) ; p(q)⊙p(c) ; 1] (trailing bias input). */
  def jointFeat(encW: Array[Array[Float]], q: String, c: String): Array[Float] = {
    val fq = projFeat(encW, q)
    val fc = projFeat(encW, c)
    val joint = new Array[Float](3 * CrossProjDim + 1)
    for (j <- 0 until CrossProjDim) {
      joint(j) = fq(j); joint(CrossProjDim + j) = fc(j)
      joint(2 * CrossProjDim + j) = fq(j) * fc(j)
    }
    joint(3 * CrossProjDim) = 1f
    joint
  }

  def crossScore(encW: Array[Array[Float]], w1: Array[Array[Float]],
      w2: Array[Float], q: String, c: String): Double = {
    val joint = jointFeat(encW, q, c)
    (0 until CrossHidden).map { i =>
      w2(i) * math.tanh((0 until joint.length).map(k => w1(i)(k).toDouble * joint(k)).sum)
    }.sum
  }

  // ---- io ----

  private def withOut(f: File)(body: DataOutputStream => Unit): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(f)))
    try body(out) finally out.close()
  }

  def writeMatrix(f: File, m: Array[Array[Float]]): Unit = withOut(f) { out =>
    out.writeInt(m.length); out.writeInt(m.head.length)
    m.foreach(_.foreach(out.writeFloat))
  }

  def writeVector(f: File, v: Array[Float]): Unit = withOut(f) { out =>
    out.writeInt(v.length); v.foreach(out.writeFloat)
  }

  def main(args: Array[String]): Unit = {
    val outDir = new File(if (args.nonEmpty) args(0) else "src/main/resources/graft/weights")
    outDir.mkdirs()
    val rnd = new java.util.Random(123L)
    val train = pairs(rnd, 4000)
    val heldOut = pairs(rnd, 1000)

    val encW = trainEncoder(train)
    val (posE, negE) = heldOut.partition(_.positive)
    val encAcc = posE.zip(negE).count { case (p, n) =>
      encScore(encW, p.a, p.b) > encScore(encW, n.a, n.b)
    }.toDouble / math.min(posE.length, negE.length)
    println(f"encoder held-out pair-ranking accuracy: $encAcc%.4f")

    val (w1, w2) = trainCross(encW, train)
    val crossAcc = posE.zip(negE).count { case (p, n) =>
      crossScore(encW, w1, w2, p.a, p.b) > crossScore(encW, w1, w2, n.a, n.b)
    }.toDouble / math.min(posE.length, negE.length)
    println(f"cross-encoder held-out pair-ranking accuracy: $crossAcc%.4f")

    require(encAcc >= 0.95 && crossAcc >= 0.95,
      s"training failed to converge (enc=$encAcc cross=$crossAcc) — not shipping tensors")

    writeMatrix(new File(outDir, "encoder_w.bin"), encW)
    writeMatrix(new File(outDir, "cross_w1.bin"), w1)
    writeVector(new File(outDir, "cross_w2.bin"), w2)
    println(s"wrote trained tensors to $outDir")
  }
}

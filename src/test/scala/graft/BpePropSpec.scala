package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.Bpe

/** Algebraic laws of the BPE tokenizer over random corpora — the invariants
  * tx23's verdict query checks on one corpus, quantified over many:
  * decode∘encode is the identity on single-space text, the merge pass never
  * leaves an adjacent (a,b) it was asked to merge, and training merges are
  * reproduced exactly by encoding (train and apply share one merge-pass).
  * Pure driver-side (no Spark job per trial) except the training law.
  */
/** One word generator for both Properties objects below — a single corpus
  * distribution for every BPE law. */
private[graft] object BpeGen {
  val genWord: Gen[String] =
    for {
      n <- Gen.chooseNum(1, 8)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString
}

object BpePropSpec extends Properties("Bpe") {
  import BpeGen.genWord

  private val genText: Gen[String] =
    for {
      n <- Gen.chooseNum(1, 12)
      ws <- Gen.listOfN(n, genWord)
    } yield ws.mkString(" ")

  private val genMerges: Gen[Seq[(String, String)]] =
    for {
      n <- Gen.chooseNum(0, 6)
      ms <- Gen.listOfN(n, for {
        a <- Gen.oneOf("a", "b", "c", "d", "ab", "cd")
        b <- Gen.oneOf("a", "b", "c", "d", Bpe.Eow)
      } yield (a, b))
    } yield ms

  property("decode∘encode is the identity under ANY merge list") =
    Prop.forAll(genText, genMerges) { (text, merges) =>
      val units = Bpe.encodeDoc(text,
        merges.map(_._1).toArray, merges.map(_._2).toArray)
      Bpe.decodeDoc(units) == text
    }

  property("mergePass leaves no adjacent (a,b) pair behind") =
    Prop.forAll(Gen.listOf(Gen.oneOf("a", "b", "ab"))) { units =>
      val out = Bpe.mergePass(units.toIndexedSeq, "a", "b")
      !(0 until out.length - 1).exists(i => out(i) == "a" && out(i + 1) == "b")
    }

  property("mergePass conserves content (concat is invariant)") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c"))) { units =>
      Bpe.mergePass(units.toIndexedSeq, "a", "b").mkString ==
        units.mkString
    }

}

/** The one Spark-backed law, in its own object so ITS reduced trial count
  * doesn't weaken the cheap pure-driver laws above (they keep ScalaCheck's
  * default 100 trials). */
object BpeTrainPropSpec extends Properties("BpeTrain") {
  import BpeGen.genWord
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15) // each trial runs a small Spark training job

  property("encode reproduces the trained vocabulary's unit sequences") = {
    val spark = TestSession.spark
    import spark.implicits._
    Prop.forAllNoShrink(Gen.listOfN(6, genWord)) { words =>
      val text = words.mkString(" ")
      val merges = Bpe.train(Seq(text).toDF("text"), "text", numMerges = 4)
      val ma = merges.map(_._1).toArray
      val mb = merges.map(_._2).toArray
      // applying the same merges by hand to each word must equal encodeDoc
      val expected = words.flatMap { w =>
        var u: IndexedSeq[String] = Bpe.wordUnits(w)
        merges.foreach { case (a, b) => u = Bpe.mergePass(u, a, b) }
        u
      }
      Bpe.encodeDoc(text, ma, mb).toSeq == expected
    }
  }
}

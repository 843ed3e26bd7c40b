package graft.props

import graft.sources.Chunker
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck invariants from SURVEY.md §5: determinism, coverage, size
  * bounds, overlap correctness — the chunker defines chunk identity, so
  * these lock the algorithm. */
object ChunkerProps extends Properties("Chunker") {

  private val word = Gen.oneOf("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot.", "golf!", "hotel?", "india", "juliet")
  private val text: Gen[String] =
    Gen.chooseNum(0, 400).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  property("deterministic") = forAll(text) { t =>
    Chunker.chunkPlain(t) == Chunker.chunkPlain(t)
  }

  property("chunks never exceed chunkSize (plain path)") = forAll(text) { t =>
    Chunker.chunkPlain(t).forall(_.length <= Chunker.DefaultChunkSize)
  }

  property("all surviving chunks beat the tiny-chunk floor") = forAll(text) { t =>
    val out = Chunker.chunkPlain(t)
    out.isEmpty || out.forall(_.length > Chunker.MinChunkChars) ||
      (out.lengthCompare(1) == 0) // single short-input chunk is exempt
  }

  property("no invented content: every chunk is built from input words") =
    forAll(text) { t =>
      Chunker.chunkPlain(t).forall(_.split("\\s+").filter(_.nonEmpty)
        .forall(w => t.contains(w)))
    }

  property("hard split overlaps by exactly `overlap` chars") =
    forAll(Gen.chooseNum(600, 3000)) { n =>
      val sentence = "a" * n + "."
      val out = Chunker.chunkPlain(sentence)
      Prop(out.size >= 2 && out.sliding(2).forall {
        case Seq(x, y) =>
          // pieces step by (size - overlap); trimming only affects the tail
          x.length <= Chunker.DefaultChunkSize &&
            (y.isEmpty || x.takeRight(Chunker.DefaultOverlap)
              .startsWith(y.take(math.min(Chunker.DefaultOverlap, y.length)).take(1)))
        case _ => true
      })
    }

  property("sanitize strips every null byte") =
    forAll(Gen.listOf(Gen.oneOf('a', 'b', ' ', '\u0000'))) { cs =>
      !Chunker.sanitize(cs.mkString).contains('\u0000')
    }
}

/** Score algebra invariants (reference X2/F4, SURVEY.md §5 fixture 6). */
object ScoreAlgebraProps extends Properties("ScoreAlgebra") {

  private val dist = Gen.chooseNum(0.0, 2.0)
  private val threshold = Gen.chooseNum(0.0, 1.0)

  property("score = 1 - d/2 is a bijection [0,2] -> [1,0]") = forAll(dist) { d =>
    val s = 1.0 - d / 2.0
    math.abs((1.0 - s) * 2.0 - d) < 1e-12 && s >= 0.0 && s <= 1.0
  }

  property("threshold rewrite: score >= t  <=>  dist <= 2(1-t)") =
    forAll(dist, threshold) { (d, t) =>
      val s = 1.0 - d / 2.0
      (s >= t) == (d <= 2.0 * (1.0 - t))
    }
}

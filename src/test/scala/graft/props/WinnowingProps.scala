package graft.props

import graft.plans.WinnowedSelect
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The native `WinnowedSelect` monotone-deque pass against a brute
  * per-window scan. The generator uses a TINY alphabet so equal gram
  * hashes are common — the rightmost tie-break is the part a deque
  * implementation gets wrong first. */
object WinnowingProps extends Properties("Winnowing") {

  private def md5Hash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  private def brute(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val t = text.toLowerCase
    val m = t.length - (k - 1)
    if (m < 1) return Set.empty
    val hs = (1 to m).map(i => md5Hash32(t.substring(i - 1, i - 1 + k)))
    val wins = math.max(m - (w - 1), 1)
    (1 to wins).map { j =>
      var bv = Long.MaxValue; var bp = 0L
      for (o <- 0 until w; p = j + o; if p <= m)
        if (hs(p - 1) <= bv) { bv = hs(p - 1); bp = p }
      (bp, bv)
    }.toSet
  }

  private def native(text: String, k: Int, w: Int): Set[(Long, Long)] =
    WinnowedSelect(Literal(text), k, w)
      .nullSafeEval(UTF8String.fromString(text))
      .asInstanceOf[GenericArrayData].array
      .map { r =>
        val row = r.asInstanceOf[GenericInternalRow]
        (row.getLong(0), row.getLong(1))
      }.toSet

  // lowercase alphabet of 2: gram-hash collisions on every other window
  private val text: Gen[String] = for {
    n <- Gen.chooseNum(0, 60)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
  } yield cs.mkString

  private val kw: Gen[(Int, Int)] = for {
    k <- Gen.chooseNum(2, 5)
    w <- Gen.chooseNum(1, 6)
  } yield (k, w)

  property("deque equals the brute per-window scan (ties included)") =
    forAll(text, kw) { case (t, (k, w)) => native(t, k, w) == brute(t, k, w) }

  property("coverage: any substring match of length w+k-1 shares a value") =
    forAll(text, text, kw) { case (a, b, (k, w)) =>
      val shared = "zqzxzvzzyw".take(w + k - 1)
      val x = a + shared + b
      val y = b + "qq" + shared + a
      val vx = native(x, k, w).map(_._2)
      val vy = native(y, k, w).map(_._2)
      (vx & vy).nonEmpty
    }

  property("selection density never exceeds the window count") =
    forAll(text, kw) { case (t, (k, w)) =>
      val m = t.length - (k - 1)
      val sel = native(t, k, w).size
      if (m < 1) sel == 0 else sel <= math.max(m - (w - 1), 1)
    }
}

package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariants for the custom kernels (mirrors the reference's
  * per-kernel Rust unit tests, SURVEY §5.3 — randomized over the input
  * space with a fixed seed instead of hand-picked cases). */
class PropertiesSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812L)
  private val trials = 200

  private def randTokens(n: Int): List[String] =
    List.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)

  private def arr(tokens: Seq[String]): GenericArrayData =
    new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any])

  private def darr(v: Array[Double]): GenericArrayData =
    new GenericArrayData(v.map(java.lang.Double.valueOf).toArray[Any])

  private def randVec(dim: Int): Array[Double] =
    Array.fill(dim)(rnd.nextDouble() * 200 - 100)

  test("simhash is order-independent") {
    (1 to trials).foreach { _ =>
      val tokens = randTokens(20)
      assert(graft.functions.SimHash64.hashArrayData(arr(tokens)) ==
        graft.functions.SimHash64.hashArrayData(arr(rnd.shuffle(tokens))))
    }
  }

  test("minhash signature slots only decrease when tokens are added") {
    (1 to trials).foreach { _ =>
      val base = randTokens(15)
      val extra = randTokens(10)
      val s1 = graft.functions.MinHashSignatureExpr.compute(arr(base), 32)
      val s2 = graft.functions.MinHashSignatureExpr
        .compute(arr(base ++ extra), 32)
      (0 until 32).foreach { i =>
        assert(s2.getLong(i) <= s1.getLong(i),
          s"slot $i grew after adding tokens")
      }
    }
  }

  test("minhash is order-independent") {
    (1 to trials).foreach { _ =>
      val tokens = randTokens(20)
      val s1 = graft.functions.MinHashSignatureExpr.compute(arr(tokens), 16)
      val s2 = graft.functions.MinHashSignatureExpr
        .compute(arr(rnd.shuffle(tokens)), 16)
      (0 until 16).foreach(i => assert(s1.getLong(i) == s2.getLong(i)))
    }
  }

  test("cosine similarity is bounded, symmetric, 1 on self") {
    (1 to trials).foreach { _ =>
      val a = randVec(16)
      val b = randVec(16)
      val ab = graft.functions.CosineSimilarity.compute(darr(a), darr(b))
      val ba = graft.functions.CosineSimilarity.compute(darr(b), darr(a))
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
      assert(math.abs(ab - ba) < 1e-12, "symmetry")
      assert(math.abs(
        graft.functions.CosineSimilarity.compute(darr(a), darr(a)) - 1.0)
        < 1e-9)
    }
  }

  test("lsh bucket is invariant under positive scaling") {
    (1 to trials).foreach { _ =>
      val v = randVec(16)
      val k = 0.1 + rnd.nextDouble() * 50
      assert(graft.functions.LshBucketExpr.compute(darr(v), 8, 7) ==
        graft.functions.LshBucketExpr.compute(
          darr(v.map(_ * k)), 8, 7))
    }
  }

  test("lsh bucket of a vector equals bucket of itself (determinism) " +
    "and nearby vectors collide more than antipodal ones") {
    var same = 0
    var anti = 0
    (1 to trials).foreach { _ =>
      val v = randVec(16)
      val eps = v.map(x => x + rnd.nextGaussian() * 0.01 * math.abs(x))
      val neg = v.map(-_)
      if (graft.functions.LshBucketExpr.compute(darr(v), 8, 7) ==
        graft.functions.LshBucketExpr.compute(darr(eps), 8, 7)) same += 1
      if (graft.functions.LshBucketExpr.compute(darr(v), 8, 7) ==
        graft.functions.LshBucketExpr.compute(darr(neg), 8, 7)) anti += 1
    }
    assert(same > anti, s"near-identical collide ($same) should beat " +
      s"antipodal ($anti)")
    assert(anti == 0, "antipodal vectors flip every sign bit")
  }
}

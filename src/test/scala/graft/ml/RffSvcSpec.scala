package graft.ml

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.ml.classification.LinearSVC
import org.apache.spark.ml.linalg.{Vector, Vectors}
import scala.util.Random

/** The kernel-SVM capability gap, closed: the reference's default `SVC()` is
  * RBF-kernel (src/main.py:101-104) and can learn boundaries no linear model
  * can. The planted XOR signal is the canonical such boundary — every linear
  * separator is ~50% on it — so RFF+LinearSVC beating LinearSVC by a wide
  * margin here demonstrates the restored NONLINEAR capacity, not a tuning
  * difference. */
class RffSvcSpec extends SparkSpec {

  /** XOR clusters at (±1, ±1), label = 1 when the signs agree, σ=0.2 noise. */
  private def xorData(n: Int, seed: Int): Seq[(Double, Vector)] = {
    val rnd = new Random(seed)
    (0 until n).map { _ =>
      val sx = if (rnd.nextBoolean()) 1.0 else -1.0
      val sy = if (rnd.nextBoolean()) 1.0 else -1.0
      val x = sx + rnd.nextGaussian() * 0.2
      val y = sy + rnd.nextGaussian() * 0.2
      ((if (sx * sy > 0) 1.0 else 0.0), Vectors.dense(x, y))
    }
  }

  private def accuracy(preds: org.apache.spark.sql.DataFrame): Double =
    Trainer.confusion(preds).collect().head.getAs[Double]("accuracy")

  test("RFF + LinearSVC learns the XOR boundary a linear SVM cannot") {
    import spark.implicits._
    val train = xorData(400, seed = 1).toDF("label", "features")
    val valid = xorData(200, seed = 2).toDF("label", "features")

    val linear = new LinearSVC().setMaxIter(15).fit(train)
    val linAcc = accuracy(linear.transform(valid))

    val rff = RffSvc.fit(train, gamma = Some(1.0), numComponents = 64, seed = 15)
    val rffAcc = accuracy(rff.transform(valid))

    // the linear ceiling on XOR is ~0.75-0.8 (a line can cut off ONE corner
    // cluster, getting 3 of 4 right); only a nonlinear boundary clears 0.95
    assert(rffAcc > 0.95, s"RFF+LinearSVC accuracy $rffAcc on XOR")
    assert(linAcc < 0.9, s"sanity: a linear SVM cannot solve XOR, got $linAcc")
    assert(rffAcc > linAcc + 0.1,
      s"nonlinear capacity must show: rff $rffAcc vs linear $linAcc")
  }

  test("registry round-trip: saved RFF model reproduces predictions exactly") {
    import spark.implicits._
    val train = xorData(300, seed = 3).toDF("label", "features")
    val valid = xorData(100, seed = 4).toDF("label", "features")
    val model = RffSvc.fit(train, gamma = Some(1.0), numComponents = 64, seed = 15)
    val dir = Files.createTempDirectory("graft_rff").toString
    model.save(dir)
    val loaded = RffSvc.load(dir)
    assert(loaded.rff == model.rff, "the map's four scalars round-trip")
    val direct = model.transform(valid).select("prediction").collect().map(_.getDouble(0)).toSeq
    val replayed = loaded.transform(valid).select("prediction").collect().map(_.getDouble(0)).toSeq
    assert(replayed == direct, "W/b regeneration from (seed, gamma, D, d) is bit-exact")
    // and through the registry's typed-loader interface (Trainer dispatch)
    val asTransformer = Trainer.loadModel("rff_svc", dir)
    val viaRegistry = asTransformer.transform(valid)
      .select("prediction").collect().map(_.getDouble(0)).toSeq
    assert(viaRegistry == direct, "registry dispatch returns the same kernel model")
    assert(asTransformer.transformSchema(valid.schema).fieldNames.contains("prediction"))
  }
}

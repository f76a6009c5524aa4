package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Format-level checks for the XGBoost binary reader (the parity-vs-
  * reference checks live in XyacModelSpec). */
class XgbBinarySpec extends AnyFunSuite {

  test("rejects input without the binf magic") {
    val e = intercept[IllegalArgumentException] {
      XgbBinary.parse("not a model at all".getBytes, Seq("f0"))
    }
    assert(e.getMessage.contains("binf"))
  }

  test("truncated model fails with an informative error, not underflow") {
    val ref = new java.io.File("/root/reference/analysis/models/in/xyac_model.model")
    assume(ref.isFile)
    val bytes = java.nio.file.Files.readAllBytes(ref.toPath)
    val cut = java.util.Arrays.copyOf(bytes, bytes.length / 3)
    val e = intercept[IllegalArgumentException] {
      XgbBinary.parse(cut, (1 to 21).map(i => s"f$i"))
    }
    assert(e.getMessage.contains("truncated"))
  }

  test("feature-count mismatch is caught before tree parsing") {
    val ref = new java.io.File("/root/reference/analysis/models/in/xyac_model.model")
    assume(ref.isFile)
    val bytes = java.nio.file.Files.readAllBytes(ref.toPath)
    val e = intercept[IllegalArgumentException] {
      XgbBinary.parse(bytes, Seq("only", "three", "features"))
    }
    assert(e.getMessage.contains("21"))
  }
}

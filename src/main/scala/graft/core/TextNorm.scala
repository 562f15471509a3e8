package graft.core

import java.text.Normalizer

import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode normalization kernel (static-call shape for codegen, like
 * [[TextExtractor.deflateRatio]]). Every serious webtext prep pipeline
 * normalizes before hashing/dedup — otherwise `é` (U+00E9) and
 * `e`+U+0301 fingerprint as different documents. NFC is the
 * cross-engine-verifiable form (DuckDB ships `nfc_normalize`, so the
 * q96 oracle checks it byte-for-byte); NFKC/NFD/NFKD ride the same
 * JDK kernel and are spec-tested.
 *
 * Fast path: already-normalized text (the overwhelming majority of a
 * real corpus — all-ASCII is NFC by construction) returns the input
 * UTF8String without re-encoding.
 */
object TextNorm {

  private def form(name: String): Normalizer.Form = name match {
    case "NFC"  => Normalizer.Form.NFC
    case "NFD"  => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other  => throw new IllegalArgumentException(
      s"unknown normalization form '$other' (NFC|NFD|NFKC|NFKD)")
  }

  def normalize(s: UTF8String, formName: String): UTF8String = {
    val f = form(formName)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}

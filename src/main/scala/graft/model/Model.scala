package graft.model

/**
 * The north-rule input shape (BASELINE.json `input_hint`): an Iceberg-shaped
 * table of interleaved text + media documents.
 *
 * Per-row invariant carried through every pipeline stage: span-sequence
 * equality — (kind, text, media_ref, order-by-offset) must survive exactly
 * (the Spark re-expression of the reference converter's row-for-row output
 * parity, /root/reference/ru_address/source/xml.py:21-38).
 */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

case class Doc(doc_id: String, spans: Seq[Span], region: String)

/** Geocoded address point (kNN target set). */
case class AddrPoint(
    addr_id: String,
    region: String,
    lat: Double,
    lon: Double,
    cell7: Long,
    cell8: Long,
    cell9: Long,
    cell10: Long,
    cell11: Long,
    norm_text: String,
    trigrams: String)

/** Region / municipality polygon row: packed rings + precomputed grid-cell
  * cover for the two-phase PIP join (SURVEY.md §2.2 Joins (b)). */
case class PolyRow(
    poly_id: String,
    region: String,
    name: String,
    rings: Seq[Seq[Double]],
    cell_cover: Seq[Long])

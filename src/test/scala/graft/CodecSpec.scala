package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{CorpusGen, SpanCodec}

/** Span-codec round-trip — the BASELINE.json per-row invariant:
  * span-sequence equality on (kind, text, media_ref, order). */
class CodecSpec extends AnyFunSuite {

  private def checkCorpus(docs: Seq[graft.model.Doc]): Unit = {
    assert(docs.nonEmpty)
    assert(docs.map(_.doc_id).distinct.size == docs.size)
    docs.foreach { d =>
      // offsets strictly increasing
      assert(d.spans.map(_.offset) == d.spans.map(_.offset).sorted)
      assert(d.spans.map(_.offset).distinct.size == d.spans.size)
      val e = SpanCodec.decode(d.spans)
      assert(e.isDefined, s"undecodable doc ${d.doc_id}")
      val re = SpanCodec.encode(e.get,
        SpanCodec.seedOf(e.get.entity_kind, e.get.id),
        SpanCodec.mediaIdOf(d.spans))
      assert(re.map(s => (s.kind, s.text, s.media_ref)) ==
        d.spans.map(s => (s.kind, s.text, s.media_ref)),
        s"round-trip mismatch for ${d.doc_id}")
    }
  }

  test("micro corpus round-trips") { checkCorpus(CorpusGen.microDocs()) }

  test("small corpus round-trips") {
    checkCorpus(CorpusGen.docsLocal(CorpusGen.small))
  }

  test("small corpus has content near the canonical tile 14/3946/5895") {
    val tile = graft.core.TileGrid.tileBBox(14, 3946, 5895)
    val ents = CorpusGen.entitiesLocal(CorpusGen.small)
    val inTile = ents.count { e =>
      e.entity_kind == "node" && {
        val p = graft.core.Mercator.project(e.lon.get, e.lat.get)
        tile.contains(p)
      }
    }
    assert(inTile > 0, "canonical tile must be non-empty")
  }

  test("referential integrity: every ref/member resolves") {
    val ents = CorpusGen.entitiesLocal(CorpusGen.small)
    val nodes = ents.filter(_.entity_kind == "node").map(_.id).toSet
    val ways = ents.filter(_.entity_kind == "way").map(_.id).toSet
    ents.foreach { e =>
      e.node_refs.foreach(r => assert(nodes.contains(r)))
      e.members.foreach(m => assert(ways.contains(m.ref_id)))
    }
  }
}

package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import TarWebDataset.{Sample, TarEntry}

class TarWebDatasetSpec extends AnyFunSuite {

  test("ustar encode -> parse round trip, including padding edge sizes") {
    // sizes exercising padding: 0, 1, 511, 512, 513
    val entries = Seq(0, 1, 511, 512, 513).zipWithIndex.map { case (n, i) =>
      TarEntry(s"f$i.bin", Array.tabulate[Byte](n)(j => (i * 7 + j).toByte))
    }
    val out = TarWebDataset.parseTar(TarWebDataset.encodeTar(entries))
    assert(out.length == entries.length)
    out.zip(entries).foreach { case (o, e) =>
      assert(o.name == e.name)
      assert(o.bytes.toSeq == e.bytes.toSeq)
    }
  }

  test("malformed input: garbage, bad checksum, truncated tail are cut off") {
    assert(TarWebDataset.parseTar("definitely not a tar".getBytes).isEmpty)
    assert(TarWebDataset.parseTar(Array.empty[Byte]).isEmpty)
    val good = TarWebDataset.encodeTar(Seq(TarEntry("a.txt", "hello".getBytes)))
    // corrupt the checksum field of the first header
    val bad = good.clone(); bad(150) = '9'
    assert(TarWebDataset.parseTar(bad).isEmpty)
    // valid entry followed by a truncated second entry: first survives
    val two = TarWebDataset.encodeTar(
      Seq(TarEntry("a.txt", "hello".getBytes), TarEntry("b.txt", ("x" * 600).getBytes)))
    // layout: hdr_a(512) + data_a(512) + hdr_b(512) ends at 1536; cut 300
    // bytes into b's 600-byte data so its declared size overruns the buffer
    val truncated = two.take(1536 + 300)
    val out = TarWebDataset.parseTar(truncated)
    assert(out.length == 1 && out.head.name == "a.txt")
  }

  test("sample grouping: basename key, multi-extension parts, dir prefixes") {
    val entries = Seq(
      TarEntry("train/000/0001.jpg", Array[Byte](1)),
      TarEntry("train/000/0001.seg.png", Array[Byte](2)),
      TarEntry("train/000/0001.txt", "cat".getBytes),
      TarEntry("train/000/0002.jpg", Array[Byte](3)),
      TarEntry("noext", Array[Byte](4))) // no dot: not part of any sample
    val samples = TarWebDataset.groupSamples(entries)
    assert(samples.map(_.key) == Seq("0001", "0002")) // first-appearance order
    val s1 = samples.head
    assert(s1.parts.keySet == Set("jpg", "seg.png", "txt"))
    assert(new String(s1.parts("txt")) == "cat")
  }
}

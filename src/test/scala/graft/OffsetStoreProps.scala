package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.cdc.{OffsetStore, StartingOffsets}

/** ScalaCheck properties for the offset-state protocol: commit/read
  * round-trip over arbitrary offsets, monotone re-commit, and the
  * startingOffsets JSON rendering for arbitrary topic/partition maps —
  * the wire-format pieces a fixture-based test only samples.
  */
object OffsetStoreProps extends Properties("OffsetStore") {

  private def freshStore(): OffsetStore =
    new OffsetStore(java.nio.file.Files.createTempDirectory("graft-prop").toString)

  property("commit then read round-trips any non-negative offset") =
    Prop.forAll(Gen.chooseNum(0L, Long.MaxValue - 1)) { o =>
      val s = freshStore()
      s.commit("t", o, 1L)
      s.lastOffset("t") == o
    }

  property("latest commit wins") =
    Prop.forAll(Gen.chooseNum(0L, 1L << 40), Gen.chooseNum(0L, 1L << 40)) { (a, b) =>
      val s = freshStore()
      s.commit("t", a, 1L); s.commit("t", b, 1L)
      s.lastOffset("t") == b
    }

  property("startingOffsetsFor resumes at committed+1 and table isolation holds") =
    Prop.forAll(Gen.chooseNum(0L, 1L << 40)) { o =>
      val s = freshStore()
      s.commit("orders", o, 1L)
      val resumed = s.startingOffsetsFor("orders", "topic.orders") ==
        StartingOffsets.PerPartition(Map("topic.orders" -> Map(0 -> (o + 1))))
      val untouched = s.startingOffsetsFor("customers", "topic.customers") ==
        StartingOffsets.Earliest
      resumed && untouched
    }

  property("partitioned commit round-trips; later partial commits advance only their partitions") =
    Prop.forAll(Gen.nonEmptyMap(Gen.zip(Gen.chooseNum(0, 8), Gen.chooseNum(0L, 1L << 40)))) { m =>
      val s = freshStore()
      s.commitPartitioned("t", m, 1L)
      val roundTrip = s.lastOffsets("t") == m && s.lastOffset("t") == m.values.max
      val p = m.keys.head
      s.commitPartitioned("t", Map(p -> (m(p) + 5)), 1L)
      roundTrip && s.lastOffsets("t") == (m + (p -> (m(p) + 5)))
    }

  property("legacy scalar state binds to partition 0; resume maps every partition to +1") =
    Prop.forAll(Gen.nonEmptyMap(Gen.zip(Gen.chooseNum(0, 8), Gen.chooseNum(0L, 1L << 40)))) { m =>
      val s = freshStore()
      s.commitPartitioned("orders", m, 1L)
      val resumed = s.startingOffsetsFor("orders", "topic.orders") ==
        StartingOffsets.PerPartition(
          Map("topic.orders" -> m.map { case (p, o) => p -> (o + 1) }))
      // the legacy single-partition writer still round-trips through the
      // same file format
      val s2 = freshStore()
      s2.commit("t", 7L, 1L)
      resumed && s2.lastOffsets("t") == Map(0 -> 7L)
    }

  property("toJson renders every per-partition map as valid Kafka option JSON") =
    Prop.forAll(Gen.mapOf(Gen.zip(
      Gen.identifier.map("t." + _),
      Gen.mapOf(Gen.zip(Gen.chooseNum(0, 8), Gen.chooseNum(0L, 1L << 40)))))) { m =>
      val json = StartingOffsets.toJson(StartingOffsets.PerPartition(m))
      // parseable by the same JSON subset Kafka accepts: balanced braces,
      // quoted topic keys, numeric offsets
      json.startsWith("{") && json.endsWith("}") &&
        m.keys.forall(t => json.contains("\"" + t + "\""))
    }
}

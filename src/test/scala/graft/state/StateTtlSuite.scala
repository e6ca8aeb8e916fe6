package graft.state

import org.scalatest.funsuite.AnyFunSuite

import StateStoreTestHelper._

/** Deterministic TTL semantics, the graft equivalent of the reference's
  * `RocksDbStateTimeoutSuite.scala:65-240` (which injected a Guava
  * FakeTicker): `-1` infinite, `0` stateless, `N>0` expiry, access resets,
  * per-query overrides — plus the case the reference got wrong: strict
  * deadlines surviving a new store version and a provider restart.
  */
class StateTtlSuite extends AnyFunSuite {

  private def ttlConf(ttlSecs: Int, strict: Boolean, extra: Map[String, String] = Map.empty) =
    storeConf(Map(
      RocksDbConf.STATE_EXPIRY_SECS -> ttlSecs.toString,
      RocksDbConf.STRICT_EXPIRE -> strict.toString) ++ extra)

  test("no timeout: ttl = -1 keeps state forever") {
    withFakeClock { clock =>
      val ckpt = newCheckpointDir()
      val provider = newProvider(ckpt, conf = ttlConf(-1, strict = true))
      try {
        val store = provider.getStore(0, None)
        put(store, "k1", 1)
        clock.advanceSecs(1000000L)
        assert(get(store, "k1").contains(1))
        assert(readAll(store) === Map("k1" -> 1))
        store.commit()
      } finally provider.close()
    }
  }

  test("statelessness: ttl = 0 expires keys immediately") {
    withFakeClock { _ =>
      val ckpt = newCheckpointDir()
      val provider = newProvider(ckpt, conf = ttlConf(0, strict = true))
      try {
        val store = provider.getStore(0, None)
        put(store, "k1", 1)
        assert(get(store, "k1").isEmpty)
        assert(readAll(store) === Map.empty)
        store.commit()
      } finally provider.close()
    }
  }

  test("processing timeout: key expires after ttl seconds without access") {
    withFakeClock { clock =>
      val ckpt = newCheckpointDir()
      val provider = newProvider(ckpt, conf = ttlConf(60, strict = true))
      try {
        val store = provider.getStore(0, None)
        put(store, "k1", 1)
        clock.advanceSecs(59)
        assert(readAll(store) === Map("k1" -> 1))
        clock.advanceSecs(2) // 61s since last access
        assert(get(store, "k1").isEmpty)
        assert(readAll(store) === Map.empty)
        store.commit()
      } finally provider.close()
    }
  }

  test("ttl resets on get and on update") {
    withFakeClock { clock =>
      val ckpt = newCheckpointDir()
      val provider = newProvider(ckpt, conf = ttlConf(60, strict = true))
      try {
        val store = provider.getStore(0, None)
        put(store, "k1", 1)
        put(store, "k2", 2)
        clock.advanceSecs(40)
        assert(get(store, "k1").contains(1)) // access k1 -> deadline reset
        put(store, "k2", 22) // update k2 -> deadline reset
        clock.advanceSecs(40) // k1: 40s since get; k2: 40s since update
        assert(get(store, "k1").contains(1))
        assert(get(store, "k2").contains(22))
        clock.advanceSecs(61)
        assert(get(store, "k1").isEmpty)
        assert(get(store, "k2").isEmpty)
        store.commit()
      } finally provider.close()
    }
  }

  test("strict deadlines survive new versions and provider restart") {
    withFakeClock { clock =>
      val ckpt = newCheckpointDir()
      val conf = ttlConf(60, strict = true)
      val p1 = newProvider(ckpt, conf = conf)
      try {
        val s0 = p1.getStore(0, None)
        put(s0, "k1", 1)
        s0.commit()
        clock.advanceSecs(30)
        // next batch, same provider: key still visible (the reference's
        // per-instance cache made restored keys invisible here)
        val s1 = p1.getStore(1, None)
        assert(get(s1, "k1").contains(1)) // access resets deadline to t=30
        s1.commit()
      } finally p1.close()

      clock.advanceSecs(45) // t=75; 45s since last access -> still live
      val p2 = newProvider(ckpt, conf = conf)
      try {
        val s2 = p2.getStore(2, None)
        assert(get(s2, "k1").contains(1))
        s2.commit()
      } finally p2.close()

      clock.advanceSecs(61) // 61s since last access -> expired, even after restart
      val p3 = newProvider(ckpt, conf = conf)
      try {
        val s3 = p3.getStore(3, None)
        assert(get(s3, "k1").isEmpty)
        assert(readAll(s3) === Map.empty)
        s3.abort()
      } finally p3.close()
    }
  }

  test("remove under strict ttl actually forgets the deadline") {
    withFakeClock { clock =>
      val ckpt = newCheckpointDir()
      val provider = newProvider(ckpt, conf = ttlConf(60, strict = true))
      try {
        val store = provider.getStore(0, None)
        put(store, "k1", 1)
        remove(store, "k1")
        assert(get(store, "k1").isEmpty)
        // re-insert: fresh deadline, full ttl available
        clock.advanceSecs(59)
        put(store, "k1", 2)
        clock.advanceSecs(59)
        assert(get(store, "k1").contains(2))
        store.commit()
      } finally provider.close()
    }
  }

  test("per-query override: stateExpirySecs.<queryName> wins over the default") {
    withFakeClock { clock =>
      // checkpoint path ends in .../myquery/state -> queryName = myquery
      // (reference RocksDbStateStoreProvider.scala:360-373)
      val root = newCheckpointDir()
      val ckpt = s"$root/myquery/state"
      val conf = ttlConf(-1, strict = true,
        extra = Map(s"${RocksDbConf.STATE_EXPIRY_SECS}.myquery" -> "10"))
      val provider = newProvider(ckpt, conf = conf)
      try {
        val store = provider.getStore(0, None)
        put(store, "k1", 1)
        clock.advanceSecs(11)
        assert(get(store, "k1").isEmpty) // per-query 10s ttl applied, not -1
        store.commit()
      } finally provider.close()
    }
  }

  test("query name derivation from checkpoint paths") {
    assert(RocksDbConf.deriveQueryName("/tmp/ckpt/myquery/state") === "myquery")
    assert(RocksDbConf.deriveQueryName("/tmp/ckpt/myquery/state/") === "myquery")
    assert(RocksDbConf.deriveQueryName("/tmp/ckpt/myquery") === "myquery")
    assert(RocksDbConf.deriveQueryName("") === RocksDbConf.UNNAMED_QUERY)
  }

  test("strict mode reclaims expired entries on access and corrects numKeys") {
    withFakeClock { clock =>
      val ckpt = newCheckpointDir()
      val provider = newProvider(ckpt, conf = ttlConf(60, strict = true))
      try {
        val store = provider.getStore(0, None)
        put(store, "k1", 1)
        put(store, "k2", 2)
        assert(store.metrics.numKeys === 2)
        clock.advanceSecs(61)
        assert(get(store, "k1").isEmpty) // access reclaims the dead record
        assert(store.metrics.numKeys === 1)
        // re-insert after reclaim works with a fresh deadline
        put(store, "k1", 10)
        assert(get(store, "k1").contains(10))
        store.commit()
      } finally provider.close()
    }
  }

  test("strict deadlines ride checkpoint-v2 lineage across provider restarts") {
    withFakeClock { clock =>
      val ckpt = newCheckpointDir()
      val conf = ttlConf(60, strict = true, extra = Map(
        "spark.sql.streaming.stateStore.checkpointFormatVersion" -> "2"))
      val p1 = newProvider(ckpt, conf = conf)
      val id1 =
        try {
          val s = p1.getStore(0, None)
          put(s, "k1", 1)
          put(s, "k2", 2)
          s.commit()
          s.getStateStoreCheckpointInfo().stateStoreCkptId
        } finally p1.close()

      // access k1 in a second commit so only its deadline refreshes
      clock.advanceSecs(40)
      val p2 = newProvider(ckpt, conf = conf)
      val id2 =
        try {
          val s = p2.getStore(1, id1)
          assert(get(s, "k1").contains(1)) // access resets k1's deadline
          s.commit()
          s.getStateStoreCheckpointInfo().stateStoreCkptId
        } finally p2.close()

      // 41-80s: k2's original deadline expired, k1's refreshed one has not —
      // the deadlines must have ridden the v2-ID'd changelog chain
      clock.advanceSecs(40)
      val p3 = newProvider(ckpt, conf = conf)
      try {
        val s = p3.getStore(2, id2)
        assert(get(s, "k1").contains(1))
        assert(get(s, "k2").isEmpty)
        s.abort()
      } finally p3.close()
    }
  }

  test("strict ttl over a multi-valued store: expiry hides the list, merge refreshes it") {
    withFakeClock { clock =>
      val cf = org.apache.spark.sql.execution.streaming.state.StateStore.DEFAULT_COL_FAMILY_NAME
      val ckpt = newCheckpointDir()
      val provider = newProvider(ckpt, conf = ttlConf(60, strict = true),
        useMultipleValuesPerKey = true)
      try {
        val store = provider.getStore(0, None)
        store.putList(keyRow("k1"), Array(valueRow(1), valueRow(2)), cf)
        clock.advanceSecs(30)
        // merge is an update: the whole list's deadline resets
        store.merge(keyRow("k1"), valueRow(3), cf)
        clock.advanceSecs(45) // 75s since putList, 45s since merge
        assert(store.valuesIterator(keyRow("k1"), cf).map(valueInt).toVector
          === Vector(1, 2, 3))
        clock.advanceSecs(61) // past the ttl with no access in between
        assert(store.valuesIterator(keyRow("k1"), cf).isEmpty)
        store.commit()
      } finally provider.close()
    }
  }

  test("lazy mode (non-strict) keeps keys visible at least until compaction") {
    withFakeClock { clock =>
      val ckpt = newCheckpointDir()
      val provider = newProvider(ckpt, conf = ttlConf(60, strict = false))
      try {
        val store = provider.getStore(0, None)
        put(store, "k1", 1)
        clock.advanceSecs(10)
        // non-strict: no exact-visibility guarantee, but must still serve
        // unexpired keys
        assert(get(store, "k1").contains(1))
        store.commit()
      } finally provider.close()
    }
  }
}

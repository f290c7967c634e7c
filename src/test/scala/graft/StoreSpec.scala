package graft

import graft.sources.Store

/** Std.System.Store analog: namespaced KV semantics and the
  * concurrent-writer atomicity contract on the shared manifest engine.
  */
class StoreSpec extends SparkSpec {

  private def newStore(tag: String): Store = new Store(spark,
    s"/root/repo/target/graft_io/store_spec_$tag-${System.nanoTime()}")

  test("set/get/delete/list follow the WsStore response contracts") {
    val st = newStore("crud")
    assert(st.get("app", "missing").isEmpty) // was_found=false
    st.set("app", "alpha", "1")
    st.set("app", "alpha", "2")
    assert(st.get("app", "alpha").contains("2")) // upsert
    st.set("app", "beta", "b")
    st.set("jobs", "run", "ok")
    assert(st.listKeys("app") == Seq("alpha", "beta"))
    assert(st.getAll("app") == Map("alpha" -> "2", "beta" -> "b"))
    assert(st.listNamespaces() == Seq("app", "jobs"))
    assert(st.delete("app", "alpha")) // was_deleted=true
    assert(!st.delete("app", "alpha")) // second delete: key gone
    assert(st.get("app", "alpha").isEmpty)
    // values may carry tabs/newlines (base64 in the manifest)
    st.set("app", "raw", "a\tb\nc")
    assert(st.get("app", "raw").contains("a\tb\nc"))
    assert(st.deleteNamespace("app"))
    assert(!st.deleteNamespace("app"))
    assert(st.listNamespaces() == Seq("jobs"))
    assertThrows[IllegalArgumentException] { st.set("bad\tns", "k", "v") }
  }

  test("setExclusive elects exactly one winner under concurrency") {
    val st = newStore("race")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { i =>
      new Thread {
        override def run(): Unit =
          if (st.setExclusive("race", "leader", s"writer$i"))
            wins.incrementAndGet()
      }
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() == 1)
    // the stored value is the winner's — some writerN, never clobbered
    val v = st.get("race", "leader").get
    assert(v.startsWith("writer"))
    // losers' values never landed: a second exclusive round still fails
    assert(!st.setExclusive("race", "leader", "late"))
  }

  test("concurrent writers to distinct keys never lose an update") {
    val st = newStore("many")
    val threads = (1 to 4).map { i =>
      new Thread {
        override def run(): Unit =
          (1 to 5).foreach(j => st.set(s"ns$i", s"k$j", s"v$i-$j"))
      }
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(st.listNamespaces() == Seq("ns1", "ns2", "ns3", "ns4"))
    (1 to 4).foreach { i =>
      assert(st.getAll(s"ns$i") ==
        (1 to 5).map(j => s"k$j" -> s"v$i-$j").toMap)
    }
    // the read-back table surface
    assert(st.asDataFrame.count() == 20)
  }
}

package graft.store

import graft.SparkSpec

class SavedFiltersSpec extends SparkSpec {

  test("save, overwrite, delete with latest-wins reads") {
    val path = java.nio.file.Files.createTempDirectory("sf_").toString + "/f"
    val store = new SavedFilters(spark, path)
    store.save("alice", "tcp only", "Proto = 'TCP'")
    store.save("alice", "big flows", "Bytes > 1000")
    store.save("bob", "tcp only", "Proto = 6")
    // overwrite alice's first filter
    store.save("alice", "tcp only", "Proto = 'TCP' AND SrcPort = 443")
    val alice = store.list("alice").collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    assert(alice("tcp only") == "Proto = 'TCP' AND SrcPort = 443")
    assert(alice("big flows") == "Bytes > 1000")
    assert(store.list("bob").count() == 1)
    // tombstone delete
    store.delete("alice", "big flows")
    assert(store.list("alice").collect().map(_.getString(1)).toSeq ==
      Seq("tcp only"))
  }
}

class WidgetsNowSpec extends SparkSpec {
  import graft.store.EventFlows

  test("dataNow anchors on the newest flow") {
    val w = new graft.queryengine.Widgets(graft.schema.FlowSchema.schema,
      EventFlows.tables(spark, "/root/testdata/sf0.001"))
    val now = w.dataNow()
    assert(now.after(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    // top-5 anchored on dataNow returns data without an explicit clock
    val top = w.top(spark, now, "SrcAS")
    assert(top.count() > 0)
  }
}

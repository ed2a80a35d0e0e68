package graft

import org.apache.spark.sql.functions.col

/** Scratch main: per-phase timing of the cold store build (derive → save →
  * read-back → lexicon build → text-index build). Not part of the API.
  */
object LoadProf {
  def main(args: Array[String]): Unit = {
    val spark = Dev.session(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val path = "/tmp/graft-store/prof"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path + "-lexicon"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path + "-lexicon-text"))
    val stmts = model.Tpch.statements(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("derive-count") { stmts.count() }
    t("save-partitioned") { model.GraftStore.save(stmts, path) }
    val st = t("read-back") {
      val s = new model.GraftStore(spark, model.GraftStore.load(spark, path).statements,
        lexiconPath = Some(path + "-lexicon"))
      s.statements.count(); s
    }
    t("lexicon-build+read") { st.nodeTerms.count() }
    t("text-index-build") { graft.search.TextIndex.forStore(st).postings.count() }
    t("recount") { st.statements.count() }
    spark.stop()
  }
}

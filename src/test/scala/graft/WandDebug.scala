package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.Synth
import graft.index.{Builder, Bm25, PostingBlock, Tokenizer}
import graft.query.{IndexHandle, Searcher, Wand}

object WandDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = Synth.corpus(spark, 400, seed = 42L).cache()
    val dir = java.nio.file.Files.createTempDirectory("wdbg").toString
    Builder.build(spark, corpus, dir,
      Builder.Config(blockSize = 32, nBuckets = 8, nSegments = 2, saltTarget = 50))
    val doc0 = Synth.doc(42L, 7L).content
    val t0 = Tokenizer.tokens(doc0)
    val terms = Seq(t0(1), t0(5))
    println("TERMS: " + terms)
    val handle = IndexHandle.open(spark, dir, 8)
    val byTerm = handle.blocksFor(terms)
      .select("term", "block_id", "doc_id_base", "doc_id_max", "num_docs",
        "max_tf", "min_dl", "doc_deltas", "tfs", "dls")
      .as[PostingBlock].collect().groupBy(_.term)
      .map { case (t, bs) => t -> bs.sortBy(_.doc_id_base) }
    terms.foreach { t =>
      val bs = byTerm.getOrElse(t, Array.empty[PostingBlock])
      val decoded = bs.flatMap(Builder.decodeBlock)
      println(s"term=$t blocks=${bs.length} postings=${decoded.length} " +
        s"df=${handle.dfOf(Seq(t))}")
      println("  ranges: " + bs.map(b => (b.doc_id_base, b.doc_id_max, b.num_docs)).mkString(" "))
      val ids = decoded.map(_.doc_id)
      println("  sorted-distinct ok per block list: " +
        bs.forall { b =>
          val d = Builder.decodeBlock(b).map(_.doc_id)
          d.sameElements(d.sorted.distinct)
        })
      println("  contains 158: " + ids.contains(158L))
      println("  dup docs: " + (ids.length - ids.distinct.length))
    }
    // raw truth from postings_raw
    val raw = spark.read.parquet(s"$dir/postings_raw")
      .filter($"term".isin(terms: _*))
      .select("term", "doc_id").as[(String, Long)].collect().groupBy(_._1)
    terms.foreach { t =>
      println(s"raw term=$t count=${raw.get(t).map(_.length)}")
    }
    spark.stop()
  }
}

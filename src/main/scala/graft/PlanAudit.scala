package graft

/** Dev tool: dump physical plans of scale-critical queries and flag
  * anti-patterns (full-table exchanges on point lookups, missing
  * pushdown, missing broadcasts). Not part of the driver contract. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.get("graft-plan-audit")
    val interesting = args.toSeq match {
      case Nil => Seq("q1_pricing_agg", "q2_feature_retrieve", "q6_interaction_timerange",
        "q15_topk_cosine", "q23_minhash_pairs", "q24_simhash_pairs", "q37_inferflow_pointwise",
        "q41_fingerprint_winnow", "q42_dedup_components", "q45_ann_int8_topk", "q47_point_in_time")
      case qs => qs
    }
    interesting.foreach { name =>
      println(s"\n================ $name ================")
      val df = SparkEntry.queries(name)(spark, dir)
      df.explain("formatted")
    }
    spark.stop()
  }
}

package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The multimodal crawl front door as a library operator (q175 is one
  * invocation): route a WARC record frame by content type, reduce every
  * modality to its near-dup keepers on the shared signature machinery.
  *
  *  - text/html → density-rule main text ([[HtmlFunctions.mainText]]) +
  *    quality gate → exact dedup (keeper = first-crawled row) →
  *    MinHash-LSH + Jaccard near-dedup;
  *  - image/audio/video → the perceptual signature plane
  *    ([[MultimodalFunctions.signatureOf]]: PNG/JPEG decode → DCT pHash,
  *    PCM → WHT fingerprint, MP4 demux → keyframe H.264 decode → pHash)
  *    → modality-scoped hamming band-prefix LSH
  *    ([[DedupFunctions.neardupPairsByHamming64]]);
  *  - both pair graphs resolve through the same
  *    [[GraphFunctions.componentLabels]] union-find.
  *
  * Returns one row per kept representative:
  * (modality, keeper_uri, n_members) where keeper_uri is the canonical
  * URL ([[UrlFunctions.canonicalizeUrl]]) of the component's
  * first-crawled record and n_members counts the crawl records that
  * collapsed into it.
  *
  * Scale shape: the WARC scan is file = task; text and signatures are
  * staged ONCE (localCheckpoint — the extracted corpus and 16-byte
  * signatures, never the binary payloads, which die in the scan tasks);
  * the near-dup joins are the one-exchange bucketed forms; pair graphs
  * resolve driver-side while verified edges stay small and fall back to
  * distributed label propagation past `maxDriverEdges`.
  *
  * Role anchor: the reference's collection pipeline reduces each
  * downloaded scene to one published representative before assets fan
  * out (bdc_collection_builder/celery/publish.py:575–605); this is the
  * same reduction for a web crawl, per modality.
  */
object CrawlFunctions {

  def multimodalKeepers(warc: DataFrame,
                        minMainChars: Int = 40,
                        shingleN: Int = 3,
                        minhashBands: Int = 4,
                        rowsPerBand: Int = 2,
                        jaccardThreshold: Double = 0.6,
                        hammingBands: Int = 8,
                        maxDistance: Int = 4): DataFrame = {
    val H = HtmlFunctions
    val U = UrlFunctions
    val D = DedupFunctions
    val M = MultimodalFunctions
    val G = GraphFunctions
    val ok = warc.filter(col("http_status") === 200)

    // ---- text path --------------------------------------------------
    val docs = ok.filter(col("http_content_type").startsWith("text/html"))
      .select(col("record_index").cast("long").as("rid"),
        U.canonicalizeUrl(col("target_uri")).as("canon"),
        H.mainText(col("payload").cast("string")).as("mt"))
      .filter(length(col("mt")) >= minMainChars)
    val exact = docs.groupBy(col("mt"))
      .agg(min(col("rid")).as("rid"),
        min_by(col("canon"), col("rid")).as("canon"),
        count(lit(1)).as("n_copies"))
      .localCheckpoint(true)
    val tpairs = D.neardupPairsLocal(exact, "mt", "rid",
        shingleN, minhashBands, rowsPerBand, jaccardThreshold)
      .select(col("id_a"), col("id_b"))
    val tlabels = G.componentLabels(exact.select(col("rid")), tpairs,
      idCol = "rid", srcCol = "id_a", dstCol = "id_b")
    val text = exact
      .join(tlabels.withColumnRenamed("id", "rid"), "rid")
      .groupBy(col("label"))
      .agg(min_by(col("canon"), col("rid")).as("keeper_uri"),
        sum(col("n_copies")).as("n_members"))
      .select(lit("text").as("modality"), col("keeper_uri"), col("n_members"))

    // ---- media path -------------------------------------------------
    val media = ok.filter(col("http_content_type").startsWith("image/") ||
        col("http_content_type").startsWith("audio/") ||
        col("http_content_type").startsWith("video/"))
      .select(col("record_index").cast("long").as("rid"),
        U.canonicalizeUrl(col("target_uri")).as("canon"),
        when(col("http_content_type").startsWith("image/"), "image")
          .when(col("http_content_type").startsWith("audio/"), "audio")
          .otherwise("video").as("modality"),
        col("payload"))
    val mediaMap = media.select(col("rid"), col("canon"), col("modality"))
      .localCheckpoint(true)
    val sigs = M.mediaSignatures(media, "rid", "modality", "payload")
      .localCheckpoint(true)
    val mpairs = D.neardupPairsByHamming64(sigs, "sig", "rid",
        partitionCols = Seq("modality"), hammingBands, maxDistance)
      .select(col("id_a"), col("id_b"))
    val mlabels = G.componentLabels(sigs.select(col("rid")), mpairs,
      idCol = "rid", srcCol = "id_a", dstCol = "id_b")
    val mediaKept = mediaMap
      .join(mlabels.withColumnRenamed("id", "rid"), "rid")
      .groupBy(col("modality"), col("label"))
      .agg(min_by(col("canon"), col("rid")).as("keeper_uri"),
        count(lit(1)).as("n_members"))
      .select(col("modality"), col("keeper_uri"), col("n_members"))

    text.unionByName(mediaKept)
  }
}

package graft.ddl

/** D3 — sharding-config replication arithmetic, as PURE functions over
  * the manifest's metadata (config-sized, driver-resident by nature:
  * the reference itself collects `config.chunks` into a map before
  * acting, config_copier.go:258-273).
  *
  * The reference replays four decisions against a sharded target:
  * source→target primary-shard mapping (config_copier.go:89-102), zone
  * tag pairing (addShardTags, :132-158), chunk split-point selection
  * (addChunks, :244-297) and round-robin chunk placement (:299-336).
  * A lake engine has no mongos to command, but the DECISIONS must be
  * reproducible so a Mongo-backed Catalog adapter can replay them —
  * and so parity is provable (`q_d3_shards` pins every one against the
  * DuckDB oracle). Quirks are preserved deliberately where the
  * reference's arithmetic is the spec, and noted where they are.
  */
object Sharding {

  /** Source→target primary-shard mapping (config_copier.go:89-102).
    * Targets ≥ sources: index-paired. Sources overflow: index-paired up
    * to the target count, then round-robin — INCLUDING the reference's
    * overwrite quirk: the second loop starts at `len(targets)-1`, so
    * source[nt-1] re-maps to target[0] (not target[nt-1]). */
  def primaryMap(source: Seq[String], target: Seq[String]): Map[String, String] = {
    require(source.nonEmpty && target.nonEmpty, "shard lists must be non-empty")
    if (target.size >= source.size) source.zip(target).toMap
    else {
      val nt = target.size
      source.take(nt).zip(target).toMap ++
        ((nt - 1) until source.size).zipWithIndex.map { case (i, j) =>
          source(i) -> target(j % nt)
        }.toMap
    }
  }

  /** Zone tag pairing (addShardTags, config_copier.go:132-158): if any
    * source shard carries tags, shard counts must match and target[i]
    * inherits every tag of source[i]. No tags anywhere → nothing to do. */
  def zoneAssignments(sourceTags: Seq[(String, Seq[String])],
      target: Seq[String]): Seq[(String, String)] = {
    if (sourceTags.forall(_._2.isEmpty)) Nil
    else {
      require(sourceTags.size == target.size,
        s"cannot migrate from ${sourceTags.size} to ${target.size} shards " +
          "when zone sharding is configured")
      sourceTags.zip(target).flatMap { case ((_, tags), t) => tags.map(t -> _) }
    }
  }

  /** Chunk split-point selection (addChunks, config_copier.go:244-297):
    * over the ns's chunks sorted by min key, with `segment = n /
    * chunksNeeded`, split at every segment-th chunk's min (every chunk's
    * min when n == chunksNeeded) until `chunksNeeded` ranges exist —
    * i.e. the first `chunksNeeded - 1` qualifying mins. Fewer chunks
    * than shards is the reference's hard error. */
  def splitPoints(chunkMins: Seq[String], chunksNeeded: Int): Seq[String] = {
    val n = chunkMins.size
    require(n >= chunksNeeded,
      "does not have enough chunks info to automatically split chunks")
    if (chunksNeeded <= 1) Nil
    else {
      val segment = n / chunksNeeded
      (1 until n)
        .filter(i => n == chunksNeeded || i % segment == 0)
        .take(chunksNeeded - 1)
        .map(chunkMins)
    }
  }

  /** Round-robin chunk placement (addChunks, config_copier.go:299-336):
    * post-split range i lands on targetShards(i), capped at the shard
    * count; a single-shard target moves nothing (the reference's
    * `chunksNeeded > 1` guard). */
  def chunkMoves(rangeMins: Seq[String],
      targetShards: Seq[String]): Seq[(String, String)] =
    if (targetShards.size <= 1) Nil
    else rangeMins.zipWithIndex
      .takeWhile(_._2 < targetShards.size)
      .map { case (m, i) => m -> targetShards(i) }
}

package graft.scoring

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Frozen embedding artifact: token→id vocabulary plus the id-indexed vector
  * matrix, broadcast into the scoring kernels.
  *
  * This is the reference's core input artifact — a pickled word→index map and
  * a NumPy matrix built from pretrained fastText vectors
  * (create_map_matrix.py:10-39, scripts/create-embedding-data.py:44-67),
  * loaded once and consumed by the embedding layer (Deeper.py:209,429-430).
  * Here it is a plain driver-side value with a Parquet loader, so a real
  * deployment points the pipeline at its own artifact
  * (`LinkageMain --embeddings <parquet>`); the deterministic fixture matrix
  * ([[EmbeddingModel.fixture]]) is only the DEFAULT, not a hardwired choice.
  *
  * Row 0 of the matrix is the padding/unknown row (all zeros, matching the
  * reference's convention — create_map_matrix.py:17); vocabulary ids are
  * therefore 1-based.
  */
case class EmbeddingModel(vocab: Map[String, Int], matrix: Array[Array[Float]]) {
  require(matrix.length > 0, "embedding matrix must have at least the padding row 0")
  val dim: Int = matrix(0).length

  /** Content hash folded into pipeline fingerprints: a resume against a
    * workdir written under a DIFFERENT artifact must recompute, not silently
    * mix compositions. Full pass over vocab + matrix bits — linear in the
    * artifact (a 2M×300 fastText matrix hashes in seconds, once per run). */
  lazy val fingerprint: String = {
    var h = 0xcbf29ce484222325L // FNV-1a style 64-bit mix
    def mix(v: Long): Unit = { h ^= v; h *= 0x100000001b3L }
    mix(matrix.length.toLong); mix(dim.toLong); mix(vocab.size.toLong)
    vocab.toSeq.sortBy(_._2).foreach { case (tok, id) =>
      mix(id.toLong)
      var i = 0
      while (i < tok.length) { mix(tok.charAt(i).toLong); i += 1 }
    }
    var r = 0
    while (r < matrix.length) {
      val row = matrix(r)
      var i = 0
      while (i < row.length) { mix(java.lang.Float.floatToIntBits(row(i)).toLong); i += 1 }
      r += 1
    }
    java.lang.Long.toHexString(h)
  }
}

object EmbeddingModel {
  /** The deterministic fixture artifact (tests / benchmarks / default). */
  lazy val fixture: EmbeddingModel =
    EmbeddingModel(graft.fixtures.Fixture.vocabIndex,
      graft.fixtures.Fixture.embeddingMatrix)

  /** Load from a Parquet table with columns (token: string, id: int,
    * vector: array<float|double>) — the schema [[graft.fixtures.Fixture.embeddingsTable]]
    * writes, i.e. the engine's interchange form of the reference's
    * vocab-pickle + matrix-npy pair. Ids must be ≥ 1 (0 is the reserved
    * padding/unknown row, emitted all-zero); gaps in the id range also become
    * zero rows. Collected to the driver — bounded by |vocab|·dim by
    * construction (the artifact IS a broadcast table; the reference loads the
    * whole matrix into memory the same way, Deeper.py:209). */
  def fromParquet(spark: SparkSession, path: String): EmbeddingModel =
    fromTable(spark.read.parquet(path))

  def fromTable(df: DataFrame): EmbeddingModel = {
    import org.apache.spark.sql.functions._
    val rows = df.select(col("token"), col("id").cast("int"),
        col("vector").cast("array<float>"))
      .collect()
    require(rows.nonEmpty, "embedding table is empty")
    val dim = rows(0).getSeq[Float](2).length
    var maxId = 0
    rows.foreach { r =>
      val id = r.getInt(1)
      require(id >= 1, s"embedding id $id < 1 (0 is the reserved padding row)")
      if (id > maxId) maxId = id
    }
    val matrix = new Array[Array[Float]](maxId + 1)
    val vocab = Map.newBuilder[String, Int]
    rows.foreach { r =>
      val id = r.getInt(1)
      val v = r.getSeq[Float](2).toArray
      require(v.length == dim,
        s"ragged embedding table: id $id has dim ${v.length}, expected $dim")
      matrix(id) = v
      vocab += r.getString(0) -> id
    }
    var i = 0
    while (i <= maxId) { if (matrix(i) == null) matrix(i) = new Array[Float](dim); i += 1 }
    EmbeddingModel(vocab.result(), matrix)
  }
}

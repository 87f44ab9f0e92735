package graft.sources

/** Per-file BLOOM FILTER sidecar entries — the pruning tier zone maps
  * cannot provide once a file's [min, max] spans the whole key domain
  * (hash-distributed layouts, high-cardinality ingest, post-shuffle
  * writes). A selective point lookup (`WHERE k = x`, `k IN (...)` — the
  * GDPR/CDC "find this one entity" shape) over such a store plans every
  * committed file from bounds alone; a per-file Bloom filter proves
  * "x cannot be in this file" for all but the (few) files that actually
  * hold the key, the same reason Parquet column indexes and Delta's
  * bloom option exist.
  *
  * Soundness: a Bloom filter has NO false negatives by construction —
  * every written non-null value sets its k bits, membership tests the
  * same k positions with the same hashes, so "absent" is a proof and
  * skipping the file can never drop a row. False positives only cost a
  * planned-but-useless file read. NULLs are never added and never
  * tested (`IS NULL` prunes through the `#n` sidecar counts instead).
  *
  * Scale note (100 TB): filters are write-time accumulators (no second
  * pass), sized from each file's DISTINCT value count at 1% FPP
  * (~9.6 bits/value, capped at [[MaxBits]] = 1 MiB per column per file
  * — past ~1.7 M distinct values the FPP degrades gracefully instead of
  * the sidecar growing unboundedly), and are read only at driver-side
  * split planning. They are opt-in per column (`bloomColumns`) exactly
  * because they are the one sidecar entry that is NOT a constant few
  * bytes — the operator pays for the columns whose point lookups
  * matter.
  *
  * Reference anchor: the Store's pluggable read path
  * (/root/reference/src/Core/Store.hs:41-67) exposes whole-partition
  * gets; this engine's committed-file statistics tier (zone maps, sums,
  * nulls, and now Blooms) is what makes the same surface plannable at
  * scale instead of scan-everything. */
object KvBloom {

  /** Bits-per-distinct-value for ~1% false-positive probability
    * (m = -n ln p / ln²2, p = 0.01 → 9.585 bits; k = 7 hashes). */
  val BitsPerValue = 9.585
  val Hashes = 7
  /** 2^23 bits = 1 MiB per column per file. */
  val MaxBits: Int = 1 << 23

  /** A decoded filter: k hash probes over an m-bit array. */
  final case class Bloom(k: Int, m: Int, bits: Array[Long]) {
    /** Membership by the value's primary hash (see [[hashLong]] /
      * [[hashString]]) — false means PROVABLY absent. */
    def mightContain(h1: Long): Boolean = {
      val h2 = mix64(h1) | 1L // odd stride; m need not be a power of two
      var i = 0
      while (i < k) {
        val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m.toLong).toInt
        if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  /** SplitMix64 finalizer — the write side and the prune side both
    * funnel values through this, which is the whole soundness story:
    * same value ⇒ same h1 ⇒ same k positions. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Primary hash of an integer-column value (int columns widen to
    * long first, matching the zone-map bounds discipline). */
  def hashLong(v: Long): Long = mix64(v)

  /** Primary hash of a string-column value: FNV-1a over UTF-8 bytes,
    * finalized — hashed on the RAW (unescaped) string, the same value
    * Spark compares against. */
  def hashString(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** Distinct-count ceiling for write-time accumulation. At [[MaxBits]]
    * (1 MiB) a filter over 2 M distincts is down to ~4.2 bits/value —
    * FPP ≈ 35%, no longer a useful prune — so past this the accumulator
    * DROPS the column's filter for the file (explicit degrade: no
    * sidecar entry ⇒ no pruning ⇒ still sound) instead of holding an
    * ever-growing hash table on the write task's heap. */
  val MaxTrackedDistinct: Int = 2 * 1000 * 1000

  /** Write-side accumulator: an open-addressing (linear-probe) Long
    * hash set, so task-side memory is ∝ the file's DISTINCT value count
    * — not its row count, which for a 100 M-row file with a low-card
    * column would otherwise buffer 800 MB per column (r13 advice).
    * Values arrive already SplitMix64-finalized ([[hashLong]] /
    * [[hashString]]), so the low bits are usable probe indices as-is.
    * Slot 0 is the empty marker; an actual 0L hash is tracked aside.
    * Crossing [[MaxTrackedDistinct]] sets `overflowed`, frees the
    * table, and turns every later add into a no-op. */
  final class HashAcc {
    private var table = new Array[Long](1 << 10)
    private var mask = table.length - 1
    private var hasZero = false
    private var n = 0
    private var over = false
    def overflowed: Boolean = over
    def isEmpty: Boolean = !over && n == 0 && !hasZero
    def add(h: Long): Unit = {
      if (over) return
      if (h == 0L) { hasZero = true; return }
      var i = (h & mask).toInt
      while (table(i) != 0L) {
        if (table(i) == h) return
        i = (i + 1) & mask
      }
      table(i) = h
      n += 1
      if (n + (if (hasZero) 1 else 0) > MaxTrackedDistinct) {
        over = true; table = null; n = 0; hasZero = false
      } else if (n * 10L >= table.length * 7L) grow()
    }
    private def grow(): Unit = {
      val old = table
      table = new Array[Long](old.length << 1)
      mask = table.length - 1
      var j = 0
      while (j < old.length) {
        val h = old(j)
        if (h != 0L) {
          var i = (h & mask).toInt
          while (table(i) != 0L) i = (i + 1) & mask
          table(i) = h
        }
        j += 1
      }
    }
    /** The distinct hashes (order irrelevant — build() sorts). */
    def toArray: Array[Long] = {
      val out = new Array[Long](n + (if (hasZero) 1 else 0))
      var k = 0
      if (hasZero) { out(k) = 0L; k += 1 }
      var j = 0
      while (j < table.length) {
        if (table(j) != 0L) { out(k) = table(j); k += 1 }
        j += 1
      }
      out
    }
  }

  /** Build a filter from the file's accumulated primary hashes (one per
    * non-null written value, duplicates welcome — sizing dedups). */
  def build(hashes: Array[Long]): Bloom = {
    java.util.Arrays.sort(hashes)
    var n = 0
    var i = 0
    while (i < hashes.length) { // count distinct (sorted)
      if (i == 0 || hashes(i) != hashes(i - 1)) n += 1
      i += 1
    }
    val mRaw = math.ceil(math.max(n, 1) * BitsPerValue).toLong
    val m = math.min(((mRaw + 63) / 64) * 64, MaxBits.toLong).toInt
    val bits = new Array[Long](m >>> 6)
    i = 0
    while (i < hashes.length) {
      if (i == 0 || hashes(i) != hashes(i - 1)) {
        val h1 = hashes(i)
        val h2 = mix64(h1) | 1L
        var j = 0
        while (j < Hashes) {
          val pos = java.lang.Long.remainderUnsigned(h1 + j.toLong * h2, m.toLong).toInt
          bits(pos >>> 6) |= 1L << (pos & 63)
          j += 1
        }
      }
      i += 1
    }
    Bloom(Hashes, m, bits)
  }

  /** Sidecar encoding: the bit words, little-endian, base64 (one line,
    * no padding concerns — base64 is comma/newline-free). */
  def encode(bits: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bits.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def decode(k: Int, m: Int, b64: String): Bloom = {
    val bytes = java.util.Base64.getDecoder.decode(b64)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val bits = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < bits.length) { bits(i) = bb.getLong(); i += 1 }
    Bloom(k, m, bits)
  }
}

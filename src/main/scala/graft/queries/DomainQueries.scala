package graft.queries

import graft.core.Graft.table
import graft.signal.Signal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Signal-domain operators (SURVEY §2.8) exercised over testdata-derived
  * synthetic waveforms: each user's event stream becomes a deterministic
  * waveform (values ordered by event_id), then WADA SNR / energy-VAD /
  * slice run on it. The scalar math is pure Scala (no SQL equivalent) →
  * rows-only checks, except the array-slice query which is relational.
  */
object DomainQueries {

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    QueryDef(
      "q_g2_wada_snr",
      covers = "G2,G5,P9",
      fn = (s, dir) => {
        // waveform per user: a clean tone plus per-event noise whose
        // amplitude scales with the event value — users with larger
        // values get noisier signals → lower (but varied) WADA SNR
        val waves = table(s, dir, "events")
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("event_id"), col("value")))).as("evs"))
          .withColumn(
            "wave",
            // peaky sin³ "speech" tone (WADA's gamma model needs heavy-
            // tailed amplitudes) + per-event noise scaled by value
            transform(
              col("evs"),
              (e, i) =>
                pow(sin((i + 1).cast("double") * 0.19634954d), 3.0d) +
                  (e.getField("value") / 2000.0d) * sin((i + 1).cast("double") * 78.233d)
            )
          )
        waves
          .select(
            col("user_id"),
            size(col("wave")).cast("long").as("n_samples"),
            // native Catalyst expression — no UDF encoder round-trip
            round(graft.plans.ArrayOps.wada_snr_native(col("wave")), 6).as("snr_db")
          )
          .orderBy("user_id")
      },
      oracle = None,
      doc = "WADA blind SNR (Kim & Stern IS'08; audio_snr.py:8-58) as a " +
        "scalar UDF over waveform arrays"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_g2_wada_table",
      covers = "G2-table-face",
      fn = (s, dir) => {
        // the oracle-checkable INTEGER core of G2: the float SNR is
        // libm-unstable cross-engine, but the gamma statistic's table
        // lookup index and the clamp decisions are integers — DuckDB
        // recomputes them from the same waveform recipe and the same
        // 121-entry G table (embedded as a literal in the oracle SQL),
        // cross-checking the table wiring engine-to-engine.
        val waves = table(s, dir, "events")
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("event_id"), col("value")))).as("evs"))
          .withColumn(
            "wave",
            transform(
              col("evs"),
              (e, i) =>
                pow(sin((i + 1).cast("double") * 0.19634954d), 3.0d) +
                  (e.getField("value") / 2000.0d) * sin((i + 1).cast("double") * 78.233d)
            )
          )
        val coreUdf = udf { (wav: Seq[Double]) =>
          val c = Signal.wadaCore(wav.toArray)
          (if (c.peakZero) 1L else 0L,
            c.idx.toLong,
            if (!c.peakZero && c.idx == 120) 1L else 0L)
        }
        waves
          .withColumn("core", coreUdf(col("wave")))
          .select(
            col("user_id"),
            size(col("wave")).cast("long").as("n_samples"),
            col("core._1").as("peak_zero"),
            col("core._2").as("table_idx"),
            col("core._3").as("hi_clamp")
          )
          .orderBy("user_id")
      },
      oracle = Some {
        val gLit = Signal.gTable.mkString("[", ", ", "]")
        s"""WITH ev AS (
           |  SELECT user_id, list(value ORDER BY event_id) AS vals
           |  FROM events GROUP BY user_id),
           |wv AS (
           |  SELECT user_id, len(vals) AS n,
           |    [pow(sin(i * 0.19634954), 3) + (vals[i] / 2000.0) * sin(i * 78.233)
           |     FOR i IN range(1, len(vals) + 1)] AS w
           |  FROM ev),
           |pk AS (
           |  SELECT user_id, n, w,
           |    list_max(list_transform(w, x -> abs(x))) AS peak
           |  FROM wv),
           |v AS (
           |  SELECT user_id, n, peak,
           |    CASE WHEN peak = 0 THEN NULL ELSE
           |      ln(greatest(1e-10,
           |        list_avg(list_transform(w, x -> greatest(abs(x) / peak, 1e-10)))))
           |      - list_avg(list_transform(w, x -> ln(greatest(abs(x) / peak, 1e-10))))
           |    END AS v3
           |  FROM pk),
           |g AS (SELECT $gLit AS gv),
           |idx AS (
           |  SELECT user_id, n, peak, v3,
           |    coalesce(list_max([i - 1 FOR i IN range(1, 122) IF gv[i] < v3]), -1) AS ti
           |  FROM v, g)
           |SELECT user_id, CAST(n AS BIGINT) AS n_samples,
           |  CAST(CASE WHEN peak = 0 THEN 1 ELSE 0 END AS BIGINT) AS peak_zero,
           |  CAST(CASE WHEN peak = 0 THEN -1 ELSE ti END AS BIGINT) AS table_idx,
           |  CAST(CASE WHEN peak != 0 AND ti = 120 THEN 1 ELSE 0 END AS BIGINT) AS hi_clamp
           |FROM idx ORDER BY user_id""".stripMargin
      },
      doc = "WADA G2 integer face: gamma-table lookup index + clamp " +
        "flags oracle-checked against DuckDB recomputing the same " +
        "121-entry table (float SNR stays property-tested — libm)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_g1_vad_segments",
      covers = "G1,G7,O4",
      fn = (s, dir) => {
        import s.implicits._
        // per-user synthetic 16 kHz signal: each event expands to 400
        // samples, loud when value > 50 (speech) else near-silence —
        // then the energy VAD (Silero parameter surface) segments it.
        val rows = table(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("value"))
          .as[(Long, Long, Double)]
        rows
          .groupByKey(_._1)
          .flatMapGroups { (uid, it) =>
            val evs = it.toArray.sortBy(_._2)
            // the 400-sample tone block is event-independent — synthesize
            // it once instead of 400 sins per event (the sin() calls were
            // the whole cost of this query, not the VAD)
            val tone = Array.tabulate(400)(j =>
              math.sin(2 * math.Pi * 440 * (j / 16000.0)))
            val wav = new Array[Double](evs.length * 400)
            var i = 0
            while (i < evs.length) {
              val amp = if (evs(i)._3 > 50.0) 0.3 else 0.001
              var j = 0
              while (j < 400) {
                wav(i * 400 + j) = amp * tone(j)
                j += 1
              }
              i += 1
            }
            Signal.energyVad(wav).zipWithIndex.map { case (seg, idx) =>
              (uid, idx.toLong, seg.start, seg.end, (seg.end - seg.start) / 16000.0)
            }
          }
          .toDF("user_id", "seg_idx", "seg_start", "seg_end", "dur_s")
          .orderBy("user_id", "seg_idx")
      },
      // The whole VAD state machine IS oracle-checkable: frame flags
      // are sqrt-exact with huge decision margins (amp 0.3/0.001 vs
      // threshold 0.02 — last-ulp sin() divergence cannot flip them),
      // raw runs are gaps-and-islands, the transitive short-silence
      // merge is a cumulative-sum sessionize (runs are ordered and
      // non-overlapping so lag(re) IS the extended end), drop/split/
      // pad are integer arithmetic. All outputs are sample offsets
      // (longs) + one exact double division.
      oracle = Some(
        """WITH ev AS (
          |  SELECT user_id,
          |    list(CASE WHEN value > 50 THEN 0.3 ELSE 0.001 END ORDER BY event_id) AS amps
          |  FROM events GROUP BY user_id),
          |base AS (SELECT user_id, amps, 400 * len(amps) AS wlen FROM ev),
          |fr AS (
          |  SELECT user_id, wlen, amps, unnest(range(0, (wlen + 479) // 480)) AS f
          |  FROM base),
          |sp AS (
          |  SELECT user_id, wlen, f,
          |    sqrt(list_sum(list_transform(range(480 * f, least(wlen, 480 * f + 480)),
          |      k -> pow(amps[CAST(k // 400 + 1 AS INTEGER)]
          |               * sin(2 * pi() * 440 * (CAST(k % 400 AS DOUBLE) / 16000.0)), 2)))
          |      / (least(wlen, 480 * f + 480) - 480 * f)) > 0.02 AS speech
          |  FROM fr),
          |runs0 AS (
          |  SELECT user_id, wlen, f,
          |    f - row_number() OVER (PARTITION BY user_id ORDER BY f) AS grp
          |  FROM sp WHERE speech),
          |runs AS (
          |  SELECT user_id, any_value(wlen) AS wlen, 480 * min(f) AS rs,
          |    least(any_value(wlen), 480 * (max(f) + 1)) AS re
          |  FROM runs0 GROUP BY user_id, grp),
          |m0 AS (
          |  SELECT user_id, wlen, rs, re,
          |    CASE WHEN lag(re) OVER (PARTITION BY user_id ORDER BY rs) IS NULL
          |         OR rs - lag(re) OVER (PARTITION BY user_id ORDER BY rs) >= 2400
          |         THEN 1 ELSE 0 END AS brk
          |  FROM runs),
          |m1 AS (
          |  SELECT user_id, wlen, rs, re,
          |    sum(brk) OVER (PARTITION BY user_id ORDER BY rs) AS sess
          |  FROM m0),
          |merged AS (
          |  SELECT user_id, any_value(wlen) AS wlen, min(rs) AS ms, max(re) AS me
          |  FROM m1 GROUP BY user_id, sess
          |  HAVING max(re) - min(rs) >= 8000),
          |pieces0 AS (
          |  SELECT user_id, wlen, ms, me,
          |    unnest(range(0, (me - ms + 239999) // 240000)) AS i
          |  FROM merged),
          |pieces AS (
          |  SELECT user_id, wlen, ms + 240000 * i AS ss,
          |    least(me, ms + 240000 * (i + 1)) AS se
          |  FROM pieces0),
          |kept AS (SELECT * FROM pieces WHERE se - ss >= 8000)
          |SELECT user_id,
          |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ss) - 1 AS BIGINT) AS seg_idx,
          |  CAST(greatest(0, ss - 480) AS BIGINT) AS seg_start,
          |  CAST(least(wlen, se + 480) AS BIGINT) AS seg_end,
          |  CAST(least(wlen, se + 480) - greatest(0, ss - 480) AS DOUBLE) / 16000.0 AS dur_s
          |FROM kept ORDER BY user_id, seg_idx""".stripMargin
      ),
      doc = "1→N VAD generator (audio_vad.py:17-67) as a typed " +
        "flatMapGroups — waveforms never leave the partition; the full " +
        "merge/drop/split/pad state machine is replayed relationally " +
        "in the DuckDB oracle (gaps-and-islands + sessionize)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_g6_audio_cut",
      covers = "G6,G7,A5",
      fn = (s, dir) =>
        // audio cut as a pure array slice (no file mutation): per-user
        // sample array → elements [3, 12] → stats. Relational → oracle.
        table(s, dir, "events")
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("event_id"), col("value")))).as("evs"))
          .withColumn("arr", transform(col("evs"), _.getField("value")))
          .withColumn("cut", slice(col("arr"), 3, 10))
          .select(
            col("user_id"),
            size(col("arr")).cast("long").as("n_total"),
            size(col("cut")).cast("long").as("n_cut"),
            aggregate(
              col("cut"),
              lit(0).cast(DecimalType(28, 6)),
              (acc, x) => (acc + x.cast(DecimalType(28, 6))).cast(DecimalType(28, 6))
            ).cast(DoubleType).as("cut_total")
          )
          .orderBy("user_id"),
      oracle = Some(
        """WITH a AS (SELECT user_id, list(value ORDER BY event_id, value) AS arr
          |           FROM events GROUP BY user_id)
          |SELECT user_id, len(arr) AS n_total,
          |  len(arr[3:12]) AS n_cut,
          |  CAST(list_sum(list_transform(arr[3:12],
          |    x -> CAST(CAST(x AS DECIMAL(28,6)) AS DECIMAL(28,6)))) AS DOUBLE) AS cut_total
          |FROM a ORDER BY user_id""".stripMargin
      ),
      doc = "audio cut/trim as array slice (data_pipeline.py:442-449) — " +
        "no files, no mutation"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_g8_resample",
      covers = "G8",
      fn = (s, dir) => {
        // G8's 48 kHz -> 16 kHz is ratio EXACTLY 3: resampleLinear's
        // interpolation positions are integers (frac = 0), so the REAL
        // resampler degenerates to decimation — out(i) = in(3i)
        // bit-exactly for the positive event values (x·1.0 + y·0.0 = x
        // for y > 0) — which an oracle can replay by list indexing.
        // The general-ratio path stays property-tested (SignalSpec);
        // this pins the library wiring and the length contract.
        val resampleUdf = udf { (xs: Seq[Double]) =>
          graft.signal.Signal.resampleLinear(xs.toArray, 48000, 16000).toSeq
        }
        table(s, dir, "events")
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("event_id"), col("value"))))
            .as("evs"))
          .withColumn("arr", transform(col("evs"), _.getField("value")))
          .withColumn("res", resampleUdf(col("arr")))
          .select(
            col("user_id"),
            size(col("arr")).cast("long").as("n_in"),
            size(col("res")).cast("long").as("n_out"),
            element_at(col("res"), 1).as("first_sample"),
            element_at(col("res"), -1).as("last_sample"),
            aggregate(
              col("res"),
              lit(0).cast(DecimalType(28, 6)),
              (acc, x) => (acc + x.cast(DecimalType(28, 6))).cast(DecimalType(28, 6))
            ).cast(DoubleType).as("res_total")
          )
          .orderBy("user_id")
      },
      oracle = Some(
        """WITH a AS (SELECT user_id, list(value ORDER BY event_id, value) AS arr
          |           FROM events GROUP BY user_id),
          |r AS (SELECT user_id, arr,
          |        list_transform(range(0, greatest(1, len(arr) // 3)),
          |          i -> arr[CAST(3 * i + 1 AS INTEGER)]) AS res
          |      FROM a)
          |SELECT user_id, len(arr) AS n_in, len(res) AS n_out,
          |  res[1] AS first_sample, res[-1] AS last_sample,
          |  CAST(list_sum(list_transform(res,
          |    x -> CAST(CAST(x AS DECIMAL(28,6)) AS DECIMAL(28,6)))) AS DOUBLE) AS res_total
          |FROM r ORDER BY user_id""".stripMargin
      ),
      doc = "REAL resampleLinear at the pipeline's 48k->16k ratio: " +
        "integer positions make linear interpolation exact decimation, " +
        "replayed in DuckDB by list indexing (length contract " +
        "max(1, n//3) included); general ratios stay property-tested"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_g3_rms_gate",
      covers = "G3",
      fn = (s, dir) => {
        // the G3 rms-threshold estimator's DECISION surface: frame
        // powers are sequential x·x sums (order-pinned), the
        // speech/noise split is sqrt(p) vs threshold — sqrt is
        // IEEE-correctly-rounded in both engines, so the counts are
        // exact. Only the final dB (log10) stays outside the oracle.
        val powersUdf = udf { (w: Seq[Double]) =>
          graft.signal.Signal.rmsFramePowers(w.toArray, 16).toSeq
        }
        table(s, dir, "events")
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("event_id"), col("value"))))
            .as("evs"))
          .select(col("user_id"),
            powersUdf(expr("transform(evs, e -> e.value / 1000.0)")).as("pw"))
          .select(
            col("user_id"),
            size(col("pw")).cast("long").as("n_frames"),
            expr("aggregate(pw, 0L, (acc, p) -> " +
              "acc + CASE WHEN sqrt(p) >= 0.066D THEN 1L ELSE 0L END)")
              .as("speech_frames"),
            expr("aggregate(pw, 0L, (acc, p) -> " +
              "acc + CASE WHEN sqrt(p) < 0.066D THEN 1L ELSE 0L END)")
              .as("noise_frames"))
          .orderBy("user_id")
      },
      oracle = Some(
        """WITH a AS (SELECT user_id,
          |    list(value / 1000.0 ORDER BY event_id, value) AS w
          |  FROM events GROUP BY user_id),
          |fr AS (SELECT user_id, unnest(range(0, len(w) // 16)) AS fi, w
          |  FROM a WHERE len(w) >= 16),
          |p AS (SELECT user_id,
          |    list_sum(list_transform(range(1, 17),
          |      j -> w[CAST(fi * 16 + j AS INTEGER)]
          |         * w[CAST(fi * 16 + j AS INTEGER)])) / 16.0 AS pw
          |  FROM fr),
          |c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_frames,
          |    CAST(sum(CASE WHEN sqrt(pw) >= 0.066 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS speech_frames,
          |    CAST(sum(CASE WHEN sqrt(pw) < 0.066 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS noise_frames
          |  FROM p GROUP BY user_id)
          |SELECT a.user_id, coalesce(c.n_frames, 0) AS n_frames,
          |  coalesce(c.speech_frames, 0) AS speech_frames,
          |  coalesce(c.noise_frames, 0) AS noise_frames
          |FROM a LEFT JOIN c USING (user_id) ORDER BY user_id""".stripMargin
      ),
      doc = "G3 rms-threshold SNR estimator, decision core: per-frame " +
        "power (sequential x*x accumulation, order replayed via " +
        "list_sum) and the sqrt-vs-threshold speech/noise split — " +
        "integer counts, engine-exact; the dB value (log10) stays " +
        "property-tested like WADA"
    )
  )
}

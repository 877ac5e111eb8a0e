"""Multimodal (binary-column) queries: image tiles/dedup/resize, audio segments/dedup, video dedup, frame features."""

from __future__ import annotations

from pyspark.sql import functions as F
from route81_spark.pipeline import apply_pipeline
from ._shared import _q

@_q(
    "media_features",
    # FULL value oracle (upgraded from rows-only, r6 verdict task #4):
    # the integer-exact descriptor core of feature extraction. Pixels
    # regenerate via the media_image_tiles CTE chain (mixed texture ->
    # +-1 noise -> clamped channels) and aggregate to whole-image
    # rgb/luma sums; waveforms regenerate via the media_audio_segments
    # chain (gains x mix-noise +-2) and aggregate to n_samples /
    # energy / lag-based zero-crossing count. The float embedding
    # vector (numpy pairwise-sum means/stds) remains rows-only by
    # nature inside extract_features — see PARITY.md.
    """
    WITH imgs AS (
      SELECT i AS media_id, i // 3 AS g, i % 3 AS v
      FROM generate_series(0, 47) t(i)
    ),
    px0 AS (
      SELECT media_id, g, v, y, x,
             g * 73 + (CASE WHEN v = 2 THEN (35 - x) * 151 + 7
                            ELSE x * 151 END) + y * 37 AS t
      FROM imgs,
           (SELECT unnest(range(0, 32)) AS y),
           (SELECT unnest(range(0, 36)) AS x)
    ),
    pm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM px0),
    pm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM pm1),
    pm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM pm2),
    prof AS (SELECT media_id, g, v, y, x, xor(m3, m3 >> 13) % 200 + 28 AS p FROM pm3),
    nz0 AS (
      SELECT media_id, g, v, y, x, c,
             (y * 36 + x) * 3 + c + g * 1000003 AS t
      FROM prof, (SELECT unnest(range(0, 3)) AS c)
      WHERE v = 1
    ),
    nm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM nz0),
    nm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM nm1),
    nm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM nm2),
    noise AS (
      SELECT media_id, y, x, c, xor(m3, m3 >> 13) % 3 - 1 AS n FROM nm3
    ),
    chan AS (
      SELECT p.media_id, p.y, p.x,
             greatest(least(p.p + coalesce(n0.n, 0), 255), 0) AS r,
             greatest(least((p.y * (53 + p.g)) % 256 + coalesce(n1.n, 0), 255), 0) AS gg,
             greatest(least((17 * p.g) % 256 + coalesce(n2.n, 0), 255), 0) AS b
      FROM prof p
      LEFT JOIN noise n0 ON n0.media_id = p.media_id AND n0.y = p.y AND n0.x = p.x AND n0.c = 0
      LEFT JOIN noise n1 ON n1.media_id = p.media_id AND n1.y = p.y AND n1.x = p.x AND n1.c = 1
      LEFT JOIN noise n2 ON n2.media_id = p.media_id AND n2.y = p.y AND n2.x = p.x AND n2.c = 2
    ),
    clips AS (
      SELECT i AS media_id, i // 3 AS g, i % 3 AS v
      FROM generate_series(0, 47) t(i)
    ),
    g0 AS (
      SELECT media_id, g, v, f,
             g * 97 + f * (CASE WHEN v = 2 THEN 13 ELSE 7 END) AS t
      FROM clips, (SELECT unnest(range(0, 65)) AS f)
    ),
    gm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM g0),
    gm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM gm1),
    gm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM gm2),
    b0 AS (SELECT media_id, g, g * 53 + 11 AS t FROM clips WHERE v = 1),
    bm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM b0),
    bm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM bm1),
    bm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM bm2),
    bump AS (SELECT media_id, xor(m3, m3 >> 13) % 65 AS f FROM bm3),
    gains AS (
      SELECT gm3.media_id, gm3.f,
             8 + xor(m3, m3 >> 13) % 24
               + CASE WHEN bump.media_id IS NOT NULL THEN 1 ELSE 0 END AS gain
      FROM gm3 LEFT JOIN bump
        ON bump.media_id = gm3.media_id AND bump.f = gm3.f
    ),
    s0 AS (
      SELECT media_id, g, v, s AS ts, g * 1009 + s AS t
      FROM clips, (SELECT unnest(range(0, 1950)) AS s)
    ),
    sm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM s0),
    sm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM sm1),
    sm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM sm2),
    su AS (SELECT media_id, g, v, ts, xor(m3, m3 >> 13) % 2001 - 1000 AS u FROM sm3),
    n0a AS (SELECT media_id, ts, g * 31 + ts + 777 AS t FROM su WHERE v = 1),
    na1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM n0a),
    na2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM na1),
    na3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM na2),
    nza AS (SELECT media_id, ts, xor(m3, m3 >> 13) % 5 - 2 AS nn FROM na3),
    samp AS (
      SELECT su.media_id, su.ts,
             su.u * gn.gain + coalesce(nza.nn, 0) AS s
      FROM su
      JOIN gains gn ON gn.media_id = su.media_id AND gn.f = su.ts // 30
      LEFT JOIN nza ON nza.media_id = su.media_id AND nza.ts = su.ts
    ),
    lagged AS (
      SELECT media_id, s,
             lag(s) OVER (PARTITION BY media_id ORDER BY ts) AS prev
      FROM samp
    )
    SELECT media_id, 'image' AS kind,
           CAST(36 AS INT) AS width, CAST(32 AS INT) AS height,
           CAST(sum(r + gg + b) AS BIGINT) AS rgb_sum,
           CAST(sum(299 * r + 587 * gg + 114 * b) AS BIGINT) AS luma_sum,
           CAST(NULL AS BIGINT) AS n_samples,
           CAST(NULL AS BIGINT) AS energy,
           CAST(NULL AS BIGINT) AS zero_cross
    FROM chan GROUP BY media_id
    UNION ALL
    SELECT s.media_id + 1000, 'audio',
           CAST(NULL AS INT), CAST(NULL AS INT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(s.s * s.s) AS BIGINT) AS energy,
           (SELECT CAST(sum(CASE WHEN (l.s < 0) <> (l.prev < 0) THEN 1 ELSE 0 END) AS BIGINT)
            FROM lagged l WHERE l.media_id = s.media_id AND l.prev IS NOT NULL) AS zero_cross
    FROM samp s GROUP BY s.media_id
    """,
)
def media_features(spark, sf_dir):
    """Integer-exact media feature descriptors over really-encoded
    BMP/PNG + PCM16 WAV payloads (one Arrow decode pass each): whole-
    image RGB/luma sums, audio sample count / energy / zero-crossings.
    The oracle regenerates every pixel and every sample; the float
    embedding path stays rows-only inside extract_features (PARITY.md
    records why: numpy pairwise summation)."""
    from route81_spark.ops.multimodal import (
        feature_stats,
        synthetic_audio_corpus_int,
        synthetic_image_corpus,
    )

    imgs = synthetic_image_corpus(spark, n=48)
    auds = synthetic_audio_corpus_int(spark, n=48).withColumn(
        "media_id", (F.col("media_id") + F.lit(1000)).cast("long")
    )
    return feature_stats(imgs.unionByName(auds))

@_q(
    "media_frames",
    """
    -- regenerate the synthetic-media arithmetic: payload hex =
    -- sha256(id), duration = id*1000 ms, video iff id % 3 = 2;
    -- frames every 700 ms capped at 64, frame hash = md5(hex:idx)
    WITH vids AS (
      SELECT i AS media_id,
             sha256(CAST(i AS VARCHAR)) AS payload_hex,
             least((i * 1000) // 700 + 1, 64) AS n_frames
      FROM generate_series(0, 127) t(i) WHERE i % 3 = 2
    ),
    f AS (
      SELECT media_id, payload_hex, unnest(generate_series(0, n_frames - 1)) AS frame_idx
      FROM vids
    )
    SELECT media_id,
           CAST(frame_idx AS INT) AS frame_idx,
           frame_idx * 700 AS ts_ms,
           md5(payload_hex || ':' || CAST(frame_idx AS VARCHAR)) AS frame_sha
    FROM f
    """,
)
def media_frames(spark, sf_dir):
    """Video frame sampling (mapInPandas row expansion) — stub decode,
    real batch plumbing; every derived value oracle-checked."""
    from route81_spark.ops.multimodal import sample_frames, synthetic_media

    return sample_frames(synthetic_media(spark, n=128), every_ms=700, max_frames=64)

@_q(
    "media_resize",
    """
    SELECT i AS media_id,
           sha256(sha256(CAST(i AS VARCHAR)) || ':64x48') AS resized_hex,
           64 AS w, 48 AS h
    FROM generate_series(0, 127) t(i) WHERE i % 3 = 0
    """,
)
def media_resize(spark, sf_dir):
    """Image resize plumbing: payload rewritten + meta dims updated in
    one schema-preserving mapInPandas pass; non-image rows untouched."""
    from route81_spark.ops.multimodal import resize_images, synthetic_media

    out = resize_images(synthetic_media(spark, n=128), 64, 48)
    return out.filter(F.col("kind") == "image").select(
        "media_id",
        F.lower(F.hex("payload")).alias("resized_hex"),
        F.col("meta.width").alias("w"),
        F.col("meta.height").alias("h"),
    )

@_q(
    "media_image_tiles",
    # same pixel regeneration as media_image_dedup's oracle (imgs ->
    # mixed texture -> +-1 noise -> clamped channels), then per-4x4-
    # tile integer sums — every tile stat recomputed bit-exactly
    """
    WITH imgs AS (
      SELECT i AS media_id, i // 3 AS g, i % 3 AS v
      FROM generate_series(0, 95) t(i)
    ),
    px0 AS (
      SELECT media_id, g, v, y, x,
             g * 73 + (CASE WHEN v = 2 THEN (35 - x) * 151 + 7
                            ELSE x * 151 END) + y * 37 AS t
      FROM imgs,
           (SELECT unnest(range(0, 32)) AS y),
           (SELECT unnest(range(0, 36)) AS x)
    ),
    pm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM px0),
    pm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM pm1),
    pm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM pm2),
    prof AS (SELECT media_id, g, v, y, x, xor(m3, m3 >> 13) % 200 + 28 AS p FROM pm3),
    nz0 AS (
      SELECT media_id, g, v, y, x, c,
             (y * 36 + x) * 3 + c + g * 1000003 AS t
      FROM prof, (SELECT unnest(range(0, 3)) AS c)
      WHERE v = 1
    ),
    nm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM nz0),
    nm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM nm1),
    nm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM nm2),
    noise AS (
      SELECT media_id, y, x, c, xor(m3, m3 >> 13) % 3 - 1 AS n FROM nm3
    ),
    chan AS (
      SELECT p.media_id, p.y, p.x,
             greatest(least(p.p + coalesce(n0.n, 0), 255), 0) AS r,
             greatest(least((p.y * (53 + p.g)) % 256 + coalesce(n1.n, 0), 255), 0) AS gg,
             greatest(least((17 * p.g) % 256 + coalesce(n2.n, 0), 255), 0) AS b
      FROM prof p
      LEFT JOIN noise n0 ON n0.media_id = p.media_id AND n0.y = p.y AND n0.x = p.x AND n0.c = 0
      LEFT JOIN noise n1 ON n1.media_id = p.media_id AND n1.y = p.y AND n1.x = p.x AND n1.c = 1
      LEFT JOIN noise n2 ON n2.media_id = p.media_id AND n2.y = p.y AND n2.x = p.x AND n2.c = 2
    )
    SELECT media_id, CAST(y // 4 AS INT) AS ty, CAST(x // 4 AS INT) AS tx,
           CAST(sum(299 * r + 587 * gg + 114 * b) AS BIGINT) AS luma_sum,
           CAST(sum(r + gg + b) AS BIGINT) AS rgb_sum,
           (min(r) = max(r) AND min(gg) = max(gg) AND min(b) = max(b)) AS uniform
    FROM chan
    GROUP BY media_id, y // 4, x // 4
    """,
)
def media_image_tiles(spark, sf_dir):
    """ViT-style 4x4 patch grid with per-tile integer stats (luma/RGB
    sums + blank-patch flag) over really-encoded BMP/PNG payloads —
    ONE Arrow decode pass, oracle regenerates every pixel."""
    from route81_spark.ops.multimodal import image_tiles, synthetic_image_corpus

    return image_tiles(synthetic_image_corpus(spark, n=96), patch=4)

@_q(
    "media_image_dedup",
    # FULL value oracle (upgraded from rows-only): the image pipeline
    # is integer end to end — mix-based pixel generation, lossless
    # BMP/PNG round trip, ITU-601 integer luma, cross-multiplied
    # area-mean compare — so DuckDB regenerates every PIXEL, recomputes
    # every dHash (verified bit-identical to the Spark decode path for
    # all 96 payloads), applies the same hamming<=3 gate (brute-force
    # here; the banded join finds the identical pair set by pigeonhole)
    # and resolves clusters with the recursive-CC min-id pattern. What
    # SQL cannot replicate (the container encode/decode itself) is
    # exactly what the byte-exact codec golden tests cover.
    """
    WITH RECURSIVE imgs AS (
      SELECT i AS media_id, i // 3 AS g, i % 3 AS v
      FROM generate_series(0, 95) t(i)
    ),
    px0 AS (
      SELECT media_id, g, v, y, x,
             g * 73 + (CASE WHEN v = 2 THEN (35 - x) * 151 + 7
                            ELSE x * 151 END) + y * 37 AS t
      FROM imgs,
           (SELECT unnest(range(0, 32)) AS y),
           (SELECT unnest(range(0, 36)) AS x)
    ),
    -- murmur-style 32-bit mix, replicated step for step (HUGEINT
    -- products; numpy wraps in uint64 but stays < 2^64 here)
    pm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM px0),
    pm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM pm1),
    pm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM pm2),
    prof AS (SELECT media_id, g, v, y, x, xor(m3, m3 >> 13) % 200 + 28 AS p FROM pm3),
    -- per-channel +-1 noise for v=1 (same mix over flat index + g*1000003)
    nz0 AS (
      SELECT media_id, g, v, y, x, c,
             (y * 36 + x) * 3 + c + g * 1000003 AS t
      FROM prof, (SELECT unnest(range(0, 3)) AS c)
      WHERE v = 1
    ),
    nm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM nz0),
    nm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM nm1),
    nm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM nm2),
    noise AS (
      SELECT media_id, y, x, c, xor(m3, m3 >> 13) % 3 - 1 AS n FROM nm3
    ),
    chan AS (
      SELECT p.media_id, p.y, p.x,
             greatest(least(p.p + coalesce(n0.n, 0), 255), 0) AS r,
             greatest(least((p.y * (53 + p.g)) % 256 + coalesce(n1.n, 0), 255), 0) AS gg,
             greatest(least((17 * p.g) % 256 + coalesce(n2.n, 0), 255), 0) AS b
      FROM prof p
      LEFT JOIN noise n0 ON n0.media_id = p.media_id AND n0.y = p.y AND n0.x = p.x AND n0.c = 0
      LEFT JOIN noise n1 ON n1.media_id = p.media_id AND n1.y = p.y AND n1.x = p.x AND n1.c = 1
      LEFT JOIN noise n2 ON n2.media_id = p.media_id AND n2.y = p.y AND n2.x = p.x AND n2.c = 2
    ),
    blocks AS (
      SELECT media_id, (y * 8) // 32 AS br, (x * 9) // 36 AS bc,
             sum(299 * r + 587 * gg + 114 * b) AS s
      FROM chan GROUP BY 1, 2, 3
    ),
    bits AS (
      SELECT a.media_id, a.br, a.bc,
             CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bit
      FROM blocks a JOIN blocks b
        ON a.media_id = b.media_id AND a.br = b.br AND b.bc = a.bc + 1
      WHERE a.bc < 8
    ),
    dh AS (
      SELECT media_id,
             CAST(CASE WHEN u >= CAST(9223372036854775808 AS HUGEINT)
                  THEN u - CAST(18446744073709551616 AS HUGEINT)
                  ELSE u END AS BIGINT) AS dhash
      FROM (
        SELECT media_id,
               sum(CAST(bit AS HUGEINT)
                   * (CAST(1 AS HUGEINT) << CAST(br * 8 + bc AS INT))) AS u
        FROM bits GROUP BY media_id
      )
    ),
    pair AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b
      FROM dh a JOIN dh b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
    ),
    bi AS (SELECT id_a AS s, id_b AS d FROM pair UNION ALL SELECT id_b, id_a FROM pair),
    reach(id, r) AS (
      SELECT DISTINCT s, s FROM bi
      UNION
      SELECT bi.s, reach.r FROM bi JOIN reach ON bi.d = reach.id
    ),
    losers AS (SELECT id FROM reach GROUP BY id HAVING min(r) <> id)
    SELECT media_id, 'image' AS kind,
           CASE WHEN (g % 2 = 0) <> (v = 1) THEN 'image/png' ELSE 'image/bmp' END AS mime
    FROM imgs
    WHERE media_id NOT IN (SELECT id FROM losers)
""",
)
def media_image_dedup(spark, sf_dir):
    """Perceptual image dedup through the pipeline-JSON surface:
    dHash -> banded hamming join -> CC -> min-id representative,
    exercised on really-encoded BMP/PNG payloads with planted
    cross-container near-dups."""
    from route81_spark.ops.multimodal import synthetic_image_corpus

    corp = synthetic_image_corpus(spark, n=96)
    out = apply_pipeline(corp, [{"$imageDedup": {"maxHamming": 3}}])
    return out.select("media_id", "kind", F.col("meta.mime").alias("mime"))

@_q(
    "media_audio_dedup",
    # FULL value oracle (upgraded from rows-only, the audio analog of
    # media_image_dedup's r6 upgrade): the aefp64 energy-envelope
    # fingerprint is integer end to end — mix-generated samples,
    # lossless PCM16 WAV round trip, s = u*gain with no division,
    # E[f] = sum(s^2) in int64 — so DuckDB regenerates every SAMPLE
    # (96 clips x 1950), recomputes every fingerprint bit-identically
    # to the Spark decode path, applies the same hamming<=3 gate
    # (brute force here; the banded join finds the identical pair set
    # by pigeonhole at max_hamming<bands) and resolves clusters with
    # the recursive-CC min-id pattern. What SQL cannot replicate (the
    # RIFF container encode/decode) is exactly what the byte-exact
    # WAV codec golden tests cover. The rfft 'spectral' fingerprint
    # variant stays pytest-covered (floats can't cross engines).
    """
    WITH RECURSIVE clips AS (
      SELECT i AS media_id, i // 3 AS g, i % 3 AS v
      FROM generate_series(0, 95) t(i)
    ),
    -- 65-frame integer gain envelope: 8 + mix32(g*97 + f*mult) % 24,
    -- near-dups (v=1) bump one hash-chosen frame by +1
    g0 AS (
      SELECT media_id, g, v, f,
             g * 97 + f * (CASE WHEN v = 2 THEN 13 ELSE 7 END) AS t
      FROM clips, (SELECT unnest(range(0, 65)) AS f)
    ),
    gm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM g0),
    gm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM gm1),
    gm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM gm2),
    b0 AS (SELECT media_id, g, g * 53 + 11 AS t FROM clips WHERE v = 1),
    bm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM b0),
    bm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM bm1),
    bm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM bm2),
    bump AS (SELECT media_id, xor(m3, m3 >> 13) % 65 AS f FROM bm3),
    gains AS (
      SELECT gm3.media_id, gm3.f,
             8 + xor(m3, m3 >> 13) % 24
               + CASE WHEN bump.media_id IS NOT NULL THEN 1 ELSE 0 END AS gain
      FROM gm3 LEFT JOIN bump
        ON bump.media_id = gm3.media_id AND bump.f = gm3.f
    ),
    -- base white noise u[t] = mix32(g*1009 + t) % 2001 - 1000
    s0 AS (
      SELECT media_id, g, v, s AS ts, g * 1009 + s AS t
      FROM clips, (SELECT unnest(range(0, 1950)) AS s)
    ),
    sm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM s0),
    sm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM sm1),
    sm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM sm2),
    su AS (SELECT media_id, g, v, ts, xor(m3, m3 >> 13) % 2001 - 1000 AS u FROM sm3),
    -- v=1 additive ±2 noise over mix32(g*31 + t + 777)
    n0 AS (SELECT media_id, ts, g * 31 + ts + 777 AS t FROM su WHERE v = 1),
    nm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM n0),
    nm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM nm1),
    nm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM nm2),
    nz AS (SELECT media_id, ts, xor(m3, m3 >> 13) % 5 - 2 AS nn FROM nm3),
    samp AS (
      SELECT su.media_id, su.ts,
             su.u * gn.gain + coalesce(nz.nn, 0) AS s
      FROM su
      JOIN gains gn ON gn.media_id = su.media_id AND gn.f = su.ts // 30
      LEFT JOIN nz ON nz.media_id = su.media_id AND nz.ts = su.ts
    ),
    -- ns=1950=65*30: aefp64's reduceat boundary (ts*65)//1950 == ts//30
    eng AS (
      SELECT media_id, ts // 30 AS f, sum(s * s) AS e
      FROM samp GROUP BY 1, 2
    ),
    bits AS (
      SELECT a.media_id, a.f AS i,
             CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
      FROM eng a JOIN eng b ON a.media_id = b.media_id AND b.f = a.f + 1
      WHERE a.f < 64
    ),
    fp AS (
      SELECT media_id,
             CAST(CASE WHEN u >= CAST(9223372036854775808 AS HUGEINT)
                  THEN u - CAST(18446744073709551616 AS HUGEINT)
                  ELSE u END AS BIGINT) AS afp
      FROM (
        SELECT media_id,
               sum(CAST(bit AS HUGEINT)
                   * (CAST(1 AS HUGEINT) << CAST(i AS INT))) AS u
        FROM bits GROUP BY media_id
      )
    ),
    pair AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b
      FROM fp a JOIN fp b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.afp, b.afp)) <= 3
    ),
    bi AS (SELECT id_a AS s, id_b AS d FROM pair UNION ALL SELECT id_b, id_a FROM pair),
    reach(id, r) AS (
      SELECT DISTINCT s, s FROM bi
      UNION
      SELECT bi.s, reach.r FROM bi JOIN reach ON bi.d = reach.id
    ),
    losers AS (SELECT id FROM reach GROUP BY id HAVING min(r) <> id)
    SELECT media_id, 'audio' AS kind, 'audio/wav' AS mime
    FROM clips
    WHERE media_id NOT IN (SELECT id FROM losers)
""",
)
def media_audio_dedup(spark, sf_dir):
    """Perceptual audio dedup through the pipeline-JSON surface:
    integer energy-envelope fingerprint (aefp64) -> banded hamming
    join -> CC -> min-id representative, on really-encoded PCM16 WAV
    with planted re-encode-grade near-dups (±2 additive noise + one
    +1 gain-frame bump)."""
    from route81_spark.ops.multimodal import synthetic_audio_corpus_int

    corp = synthetic_audio_corpus_int(spark, n=96)
    out = apply_pipeline(
        corp, [{"$audioDedup": {"maxHamming": 3, "method": "energy"}}]
    )
    return out.select("media_id", "kind", F.col("meta.mime").alias("mime"))

@_q(
    "media_audio_segments",
    # same integer waveform regeneration as media_audio_dedup's oracle
    # (clips -> gains -> samples -> 30-sample frame energies), then
    # classic gaps-and-islands (f - row_number over active frames) for
    # the segment runs — every boundary and energy is integer-exact
    """
    WITH clips AS (
      SELECT i AS media_id, i // 3 AS g, i % 3 AS v
      FROM generate_series(0, 95) t(i)
    ),
    g0 AS (
      SELECT media_id, g, v, f,
             g * 97 + f * (CASE WHEN v = 2 THEN 13 ELSE 7 END) AS t
      FROM clips, (SELECT unnest(range(0, 65)) AS f)
    ),
    gm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM g0),
    gm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM gm1),
    gm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM gm2),
    b0 AS (SELECT media_id, g, g * 53 + 11 AS t FROM clips WHERE v = 1),
    bm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM b0),
    bm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM bm1),
    bm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM bm2),
    bump AS (SELECT media_id, xor(m3, m3 >> 13) % 65 AS f FROM bm3),
    gains AS (
      SELECT gm3.media_id, gm3.f,
             8 + xor(m3, m3 >> 13) % 24
               + CASE WHEN bump.media_id IS NOT NULL THEN 1 ELSE 0 END AS gain
      FROM gm3 LEFT JOIN bump
        ON bump.media_id = gm3.media_id AND bump.f = gm3.f
    ),
    s0 AS (
      SELECT media_id, g, v, s AS ts, g * 1009 + s AS t
      FROM clips, (SELECT unnest(range(0, 1950)) AS s)
    ),
    sm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM s0),
    sm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM sm1),
    sm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM sm2),
    su AS (SELECT media_id, g, v, ts, xor(m3, m3 >> 13) % 2001 - 1000 AS u FROM sm3),
    n0 AS (SELECT media_id, ts, g * 31 + ts + 777 AS t FROM su WHERE v = 1),
    nm1 AS (SELECT *, CAST((CAST(t AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS m1 FROM n0),
    nm2 AS (SELECT *, xor(m1, m1 >> 16) AS m2 FROM nm1),
    nm3 AS (SELECT *, CAST((CAST(m2 AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT) AS m3 FROM nm2),
    nz AS (SELECT media_id, ts, xor(m3, m3 >> 13) % 5 - 2 AS nn FROM nm3),
    samp AS (
      SELECT su.media_id, su.ts,
             su.u * gn.gain + coalesce(nz.nn, 0) AS s
      FROM su
      JOIN gains gn ON gn.media_id = su.media_id AND gn.f = su.ts // 30
      LEFT JOIN nz ON nz.media_id = su.media_id AND nz.ts = su.ts
    ),
    eng AS (
      SELECT media_id, ts // 30 AS f, CAST(sum(s * s) AS BIGINT) AS e
      FROM samp GROUP BY 1, 2
    ),
    act AS (SELECT media_id, f, e FROM eng WHERE e >= 3000000000),
    isl AS (
      SELECT media_id, f, e,
             f - row_number() OVER (PARTITION BY media_id ORDER BY f) AS grp
      FROM act
    ),
    seg0 AS (
      SELECT media_id, grp, min(f) AS start_frame, max(f) AS end_frame,
             count(*) AS n_frames, CAST(sum(e) AS BIGINT) AS energy
      FROM isl GROUP BY 1, 2
    ),
    kept AS (SELECT * FROM seg0 WHERE n_frames >= 2)
    SELECT media_id,
           CAST(row_number() OVER (PARTITION BY media_id ORDER BY start_frame) AS INT) - 1 AS seg_idx,
           CAST(start_frame AS INT) AS start_frame,
           CAST(end_frame AS INT) AS end_frame,
           CAST(n_frames AS INT) AS n_frames,
           energy
    FROM kept
    """,
)
def media_audio_segments(spark, sf_dir):
    """VAD-shaped energy segmentation over really-encoded PCM16 WAV:
    decode + frame energies + run detection in ONE Arrow pass, integer
    end to end so the oracle regenerates every sample and recomputes
    every segment boundary."""
    from route81_spark.ops.multimodal import (
        audio_segments,
        synthetic_audio_corpus_int,
    )

    corp = synthetic_audio_corpus_int(spark, n=96)
    return audio_segments(corp, threshold=3_000_000_000, min_frames=2)

@_q(
    "media_video_dedup",
    # the dedup input is two REAL sample_frames passes (mapInPandas)
    # over the same synthetic payloads: the +1000-id copy is a
    # 24-frame "trimmed cut" of each original (same footage, shorter),
    # so every (v, v+1000) pair shares exactly the copy's frame set.
    # The oracle regenerates the frame arithmetic (sha = md5(sha256(id)
    # || ':' || idx), nf = min(id*1000//700 + 1, cap)), reproduces the
    # integer Jaccard gate shared*10 >= 3*union, and resolves clusters
    # with the same recursive-CC + min-id-representative used by the
    # SemDeDup oracle.
    """
    WITH RECURSIVE v AS (
      SELECT i AS media_id, i AS src,
             least((i * 1000) // 700 + 1, 64) AS nf
      FROM generate_series(0, 127) t(i) WHERE i % 3 = 2
      UNION ALL
      SELECT i + 1000, i, least((i * 1000) // 700 + 1, 24)
      FROM generate_series(0, 127) t(i) WHERE i % 3 = 2
    ),
    f AS (
      SELECT media_id, src, unnest(generate_series(0, nf - 1)) AS idx FROM v
    ),
    fh AS (
      SELECT media_id,
             md5(sha256(CAST(src AS VARCHAR)) || ':' || CAST(idx AS VARCHAR)) AS sha
      FROM f
    ),
    pair AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b, count(*) AS shared
      FROM fh a JOIN fh b ON a.sha = b.sha AND a.media_id < b.media_id
      GROUP BY 1, 2
    ),
    ok AS (
      SELECT p.id_a, p.id_b
      FROM pair p
      JOIN v va ON va.media_id = p.id_a
      JOIN v vb ON vb.media_id = p.id_b
      WHERE p.shared * 10 >= 3 * (va.nf + vb.nf - p.shared)
    ),
    bi AS (
      SELECT id_a AS s, id_b AS d FROM ok UNION ALL SELECT id_b, id_a FROM ok
    ),
    reach(id, r) AS (
      SELECT DISTINCT s, s FROM bi
      UNION
      SELECT bi.s, reach.r FROM bi JOIN reach ON bi.d = reach.id
    ),
    losers AS (SELECT id FROM reach GROUP BY id HAVING min(r) <> id)
    SELECT media_id, CAST(nf AS BIGINT) AS n_frames
    FROM v WHERE media_id NOT IN (SELECT id FROM losers)
    """,
)
def media_video_dedup(spark, sf_dir):
    """Frame-overlap video dedup: every +1000-id video is a trimmed
    re-cut of its original (identical payload, 24-frame cap); the
    integer-Jaccard frame join + CC keeps the original as the min-id
    representative."""
    from route81_spark.ops.multimodal import (
        sample_frames,
        synthetic_media,
        video_dedup,
    )

    corp = synthetic_media(spark, n=128)
    cut = corp.withColumn("media_id", F.col("media_id") + F.lit(1000))
    frames = sample_frames(corp, every_ms=700, max_frames=64).unionByName(
        sample_frames(cut, every_ms=700, max_frames=24)
    )
    return video_dedup(frames, threshold_ratio=(3, 10))

#!/usr/bin/env python3
"""Isolated full-suite bench: run the graft Bench in CHUNKED fresh JVMs.

One ~190-plan session stresses the JIT code cache and accumulates
broadcast/codegen garbage that inflates later queries (see build.sbt's
ReservedCodeCacheSize note); the round-9 verdict asked for the canonical
round artifact to be produced in isolation instead. This driver:

 1. asks Bench for the query inventory (SPARK_GRAFT_BENCH_LIST=1 — no
    Spark session);
 2. splits it into chunks of --chunk queries (default 12), streaming-
    cadence queries in their own chunks so their trigger time never
    shares a JVM with plan-cost timing;
 3. runs each chunk as `java -cp ... graft.Bench` with
    SPARK_GRAFT_BENCH_ONLY=<chunk> in a FRESH JVM (same JVM flags as
    build.sbt's fork options);
 4. SELF-HEALS degraded chunks: after the first pass, any chunk whose
    cpu probe falls outside ±25 % of the run's median probe (a noisy
    box window — round 11 shipped exactly one such chunk and had to
    adjudicate it across two files and a doc paragraph) is re-run, up
    to --max-reruns times, and the attempt closest to the median probe
    (preferring in-band) is the one merged. The band, every attempt's
    probe, and which attempt won are recorded in the artifact, so
    `rNN_iso.json` is the single artifact of record;
 5. merges the per-chunk JSONs into one bench line — per-query min /
    median / spread preserved, plan-cost `value` and `streaming_total`
    recomputed over the union, and every chunk's machine probes
    recorded under `probes` so tools/bench_compare.py can normalize.

Streaming-cadence queries get ONE QUERY PER JVM (not just their own
chunks): their wall-clock is trigger/drain lifecycle, and sharing a JVM
lets one query's lingering streaming threads (checkpoint fsync, state
cleanup) land in the next one's timed region — per-query isolation makes
`streaming_total` comparable round-over-round the way plan-cost is.

Usage: python3 tools/bench_iso.py [--sf DIR] [--chunk N] [--out FILE]
The classpath is read from target/bench_classpath (run
  sbt -batch 'export Runtime/fullClasspath' | tail -1 > target/bench_classpath
first, or pass --classpath). Kept under target/ so the generated
absolute-path dump never sits in the repo root.
"""
import argparse
import json
import os
import pathlib
import statistics
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

JVM_FLAGS = [
    "-Xmx24g",
    "-XX:ReservedCodeCacheSize=1g",
    "-Dspark.ui.enabled=false",
    "-Dspark.sql.session.timeZone=UTC",
]
ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]
for p in ADD_OPENS:
    JVM_FLAGS += ["--add-opens", f"{p}=ALL-UNNAMED"]


def run_java(classpath, env_extra, out_file):
    env = dict(os.environ)
    env.update(env_extra)
    if out_file:
        # a stale chunk file from a previous invocation must never be
        # mistaken for this run's output (a crashed JVM would otherwise
        # silently inject the previous build's timings)
        pathlib.Path(out_file).unlink(missing_ok=True)
    cmd = ["java"] + JVM_FLAGS + ["-cp", classpath, "graft.Bench"]
    r = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True, text=True)
    if out_file:
        if pathlib.Path(out_file).exists():
            return json.loads(pathlib.Path(out_file).read_text()), r.returncode
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:] + "\n")
        raise SystemExit(
            f"chunk JVM wrote no output file {out_file} (rc={r.returncode})")
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line), r.returncode
    sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:] + "\n")
    raise SystemExit(f"inventory run produced no JSON (rc={r.returncode})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--chunk", type=int, default=12)
    ap.add_argument("--out", default=str(REPO / "bench_out" / "r12_iso.json"))
    ap.add_argument("--classpath", default=None)
    ap.add_argument("--repeats", default="3")
    ap.add_argument("--only", default=None,
                    help="comma-separated query subset (debugging aid)")
    ap.add_argument("--band-pct", type=float, default=25.0,
                    help="probe band around the run median, percent")
    ap.add_argument("--max-reruns", type=int, default=2,
                    help="re-run attempts per probe-degraded chunk")
    ap.add_argument("--floors", default=None,
                    help="stream floors json (StreamProfile output): any "
                         "streaming query whose merged min exceeds the "
                         "1.35x per-query WARN ratio is re-run in fresh "
                         "JVMs (min-of-N adjudication, the r15 "
                         "q_st_vec-reps protocol promoted into the "
                         "harness); raw and adjudicated values are both "
                         "recorded under stream_reruns")
    ap.add_argument("--stream-reruns", type=int, default=4,
                    help="max fresh-JVM re-measurements per WARN'd "
                         "streaming fixture (with --floors)")
    args = ap.parse_args()

    cp_file = REPO / "target" / "bench_classpath"
    legacy = REPO / ".bench_classpath"  # pre-round-11 location
    classpath = args.classpath or (
        cp_file if cp_file.exists() else legacy).read_text().strip()

    inv, _ = run_java(classpath, {"SPARK_GRAFT_BENCH_LIST": "1"}, None)
    streaming = set(inv["streaming_queries"])
    queries = inv["queries"]
    if args.only:
        want = set(x.strip() for x in args.only.split(",") if x.strip())
        unknown = want - set(queries)
        if unknown:
            raise SystemExit(f"--only names unknown queries: {sorted(unknown)}")
        queries = [q for q in queries if q in want]
    plan_qs = [q for q in queries if q not in streaming]
    stream_qs = [q for q in queries if q in streaming]
    chunks = [plan_qs[i:i + args.chunk]
              for i in range(0, len(plan_qs), args.chunk)]
    # streaming queries: one per JVM (see module doc)
    chunks += [[q] for q in stream_qs]

    out_dir = pathlib.Path(args.out).parent
    out_dir.mkdir(parents=True, exist_ok=True)
    # chunk files are namespaced by the --out stem so two bench
    # invocations sharing a directory never delete each other's chunk
    # artifacts mid-run; stale files of THIS run's family are cleared
    # (chunk membership shifts whenever the query inventory grows, so a
    # leftover chunk_N can hold different queries than this run's)
    stem = pathlib.Path(args.out).stem
    for stale in out_dir.glob(f"{stem}_chunk_*.json"):
        stale.unlink()

    def run_chunk(i, chunk, attempt):
        chunk_out = out_dir / f"{stem}_chunk_{i}_a{attempt}.json"
        j, rc = run_java(classpath, {
            "SPARK_GRAFT_BENCH_ONLY": ",".join(chunk),
            "SPARK_GRAFT_SF_DIR": args.sf,
            "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            "SPARK_GRAFT_BENCH_REPEATS": args.repeats,
            "SPARK_GRAFT_BENCH_TARGET_WARM": "1",
            "SPARK_GRAFT_BENCH_OUT": str(chunk_out),
        }, chunk_out)
        return j, rc

    results = []  # per chunk: list of attempt JSONs
    for i, chunk in enumerate(chunks):
        j, rc = run_chunk(i, chunk, 0)
        results.append([j])
        done = sum(len(c) for c in chunks[:i + 1])
        print(f"chunk {i + 1}/{len(chunks)}: {len(chunk)} queries, "
              f"rc={rc}, probe={j.get('probe_cpu_sec')}, "
              f"{done}/{len(queries)} total", flush=True)

    # self-heal: median probe over first attempts defines the band; any
    # out-of-band chunk re-runs until an in-band attempt lands (or
    # attempts are exhausted — then the probe-closest-to-median wins)
    firsts = [r[0].get("probe_cpu_sec") for r in results]
    med = statistics.median([p for p in firsts if p and p > 0] or [0.0])
    lo, hi = med * (1 - args.band_pct / 100), med * (1 + args.band_pct / 100)

    def in_band(j):
        p = j.get("probe_cpu_sec")
        return p is not None and lo <= p <= hi

    for i, chunk in enumerate(chunks):
        attempt = 1
        while not in_band(results[i][-1]) and attempt <= args.max_reruns:
            p = results[i][-1].get("probe_cpu_sec")
            print(f"chunk {i}: probe {p} outside [{lo:.3f}, {hi:.3f}] — "
                  f"re-running (attempt {attempt}/{args.max_reruns})",
                  flush=True)
            j, _ = run_chunk(i, chunk, attempt)
            results[i].append(j)
            attempt += 1

    # final calm-box sweep: a chunk that exhausted its inline reruns
    # without landing in-band gets ONE more attempt after the whole
    # pass — the box is often quiet by then (round 12 shipped a
    # quarter-degraded artifact this sweep would likely have healed)
    for i, chunk in enumerate(chunks):
        if not any(in_band(j) for j in results[i]):
            p = results[i][-1].get("probe_cpu_sec")
            print(f"chunk {i}: probe {p} still outside [{lo:.3f}, {hi:.3f}] "
                  f"after {len(results[i])} attempts — final calm-box retry",
                  flush=True)
            j, _ = run_chunk(i, chunk, len(results[i]))
            results[i].append(j)

    merged_q, merged_med, merged_spread, merged_err = {}, {}, {}, {}
    probes = []
    warmup_failed = 0
    for i, chunk in enumerate(chunks):
        attempts = results[i]
        in_b = [j for j in attempts if in_band(j)]
        pick = min(in_b or attempts,
                   key=lambda j: abs((j.get("probe_cpu_sec") or 1e9) - med))
        merged_q.update(pick["queries"])
        merged_med.update(pick.get("median", {}))
        merged_spread.update(pick.get("spread", {}))
        merged_err.update(pick.get("errors", {}))
        warmup_failed += pick.get("warmup_failed", 0)
        # queries listed per probe so a degraded-window chunk can be
        # attributed from the merged artifact alone (no chunk-file digs)
        probes.append({"chunk": i,
                       "probe_cpu_sec": pick.get("probe_cpu_sec"),
                       "probe_shuffle_sec": pick.get("probe_shuffle_sec"),
                       "attempts": len(attempts),
                       "attempt_probes": [j.get("probe_cpu_sec")
                                          for j in attempts],
                       "in_band": in_band(pick),
                       "queries": chunk})

    # WARN-adjudication pass (--floors): the stream gate's 1.35x
    # per-query WARN flags single-JVM tails that round 15 adjudicated
    # by hand with committed rep files; here the harness does it —
    # re-measure each WARN'd fixture in fresh JVMs (min-of-N, stop
    # early once in-WARN) and let the gate consume the adjudicated
    # min, with the raw value and every attempt kept in the artifact.
    WARN_RATIO = 1.35
    stream_reruns = {}
    if args.floors:
        floors = json.load(open(args.floors))["queries"]
        for q in sorted(set(merged_q) & set(streaming) & set(floors)):
            raw = merged_q.get(q)
            floor = floors[q]["floor_sec"]
            if raw is None or floor <= 0 or raw <= WARN_RATIO * floor:
                continue
            attempts = []
            for a in range(args.stream_reruns):
                out_f = out_dir / f"{stem}_srerun_{q}_a{a}.json"
                j, _ = run_java(classpath, {
                    "SPARK_GRAFT_BENCH_ONLY": q,
                    "SPARK_GRAFT_SF_DIR": args.sf,
                    "SPARK_GRAFT_CPUS":
                        os.environ.get("SPARK_GRAFT_CPUS", "32"),
                    "SPARK_GRAFT_BENCH_REPEATS": args.repeats,
                    "SPARK_GRAFT_BENCH_TARGET_WARM": "1",
                    "SPARK_GRAFT_BENCH_OUT": str(out_f),
                }, out_f)
                v = j["queries"].get(q)
                if v is not None:
                    attempts.append(v)
                print(f"stream rerun {q}: attempt {a + 1} -> {v} "
                      f"(raw {raw:.2f}, floor {floor:.2f})", flush=True)
                if v is not None and v <= WARN_RATIO * floor:
                    break
            adjudicated = min([raw] + attempts)
            merged_q[q] = adjudicated
            stream_reruns[q] = {"raw": raw, "floor": floor,
                                "attempt_mins": attempts,
                                "adjudicated": adjudicated}

    ok = {k: v for k, v in merged_q.items() if v is not None}
    total = sum(v for k, v in ok.items() if k not in streaming)
    streaming_total = sum(v for k, v in ok.items() if k in streaming)
    cpu = [p["probe_cpu_sec"] for p in probes if p["probe_cpu_sec"] and p["probe_cpu_sec"] > 0]
    shuf = [p["probe_shuffle_sec"] for p in probes if p["probe_shuffle_sec"] and p["probe_shuffle_sec"] > 0]
    line = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": merged_q, "median": merged_med, "spread": merged_spread,
        "streaming_total": streaming_total,
        "streaming_queries": sorted(streaming),
        "repeats": int(args.repeats),
        "warmup_failed": warmup_failed,
        "probe_cpu_sec": statistics.median(cpu) if cpu else -1.0,
        "probe_shuffle_sec": statistics.median(shuf) if shuf else -1.0,
        "probe_band": {"median": med, "lo": lo, "hi": hi,
                       "pct": args.band_pct, "max_reruns": args.max_reruns,
                       "out_of_band_chunks":
                           [p["chunk"] for p in probes if not p["in_band"]]},
        "probes": probes,
        # WARN'd streaming fixtures re-measured in fresh JVMs: the
        # `queries` values above are the ADJUDICATED mins; raw +
        # attempts preserved here so nothing needs a hand-written
        # noise narrative
        "stream_reruns": stream_reruns,
        "errors": merged_err,
        "n_failed": sum(1 for v in merged_q.values() if v is None),
        "sf": args.sf, "isolation": f"chunked:{args.chunk}",
        # every chunk ran with SPARK_GRAFT_BENCH_TARGET_WARM=1 — recorded
        # so warmed artifacts are distinguishable from unwarmed ones
        "target_warm": True,
    }
    pathlib.Path(args.out).write_text(json.dumps(line) + "\n")
    print(f"wrote {args.out}: plan-cost total {total:.1f}s over {len(ok)} "
          f"queries, streaming {streaming_total:.1f}s, "
          f"{line['n_failed']} failed")


if __name__ == "__main__":
    main()

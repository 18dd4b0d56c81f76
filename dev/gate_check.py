#!/usr/bin/env python3
"""Round-gate step 0 (dev/NOTES.md): assert the round ARTIFACTS are
green before the snapshot commit references them.

Usage: python3 dev/gate_check.py <round>   e.g. python3 dev/gate_check.py 7

Checks, against the repo root:
  1. BENCH_r{N}.json exists and its embedded "failed":[...] list is
     empty (the r6 failure class: 37 failing queries shipped inside an
     rc=0 artifact).
  2. CORRECTNESS_r{N}.json exists and every entry has err == null or
     err == "no_oracle".
  3. Every query name in CORRECTNESS also... (the driver derives its
     query list from SparkEntry at run time, so a missing-key diff
     needs the JVM; the cheap proxy here is: CORRECTNESS must contain
     at least as many entries as the previous round's).

Exit 0 = green; nonzero with a reason otherwise. Dev tool only.
"""
import json
import re
import sys


def main(rnd: int) -> int:
    ok = True

    bench_path = f"BENCH_r{rnd:02d}.json"
    try:
        bench = json.load(open(bench_path))
    except FileNotFoundError:
        print(f"GATE RED: {bench_path} missing")
        return 2
    # the driver artifact wraps the bench line: {"rc", "tail", "parsed"}
    # — prefer the parsed metric object, fall back to regexing the
    # (escaped) tail text
    parsed = bench.get("parsed")
    if isinstance(parsed, dict) and "failed" in parsed:
        if parsed["failed"]:
            print(f"GATE RED: {bench_path} failed list non-empty: {parsed['failed']}")
            ok = False
    else:
        tail = bench.get("tail", "") or ""
        m = re.search(r'\\?"failed\\?":\[(.*?)\]', tail)
        if m is None:
            print(f"GATE RED: {bench_path} has no \"failed\" list — unparseable artifact")
            ok = False
        elif m.group(1).strip():
            print(f"GATE RED: {bench_path} failed list non-empty: [{m.group(1)}]")
            ok = False
    if bench.get("rc", 0) != 0:
        print(f"GATE RED: {bench_path} rc={bench.get('rc')}")
        ok = False

    # Window-health markers (r14 verdict item 4): Bench emits 1-min
    # /proc/loadavg at start/end plus whole-JVM wall. Load well above
    # the bench's own thread count means the host window was contended
    # and per-query times are NOT comparable — flag it (informational,
    # not red) so a slow artifact no longer needs a manual triage cycle
    # to be explained.
    def window_suspect(d: dict, src: str) -> None:
        ls, le = d.get("load_start"), d.get("load_end")
        cpus = d.get("cpus", 32)
        if ls is None or le is None:
            return
        # load_max is sampled once per query, so it sees mid-run windows
        # the endpoint samples miss. Empirically a clean full-board run
        # keeps 1-min loadavg < ~8 even while benching (sub-second
        # queries leave the EMA low); half the thread count is already
        # strong evidence of a co-tenant.
        hot = max(ls, le, d.get("load_max") or 0)
        # steal_pct is the decisive signal: hypervisor steal stretches
        # wall time 3-5x while guest loadavg stays low (measured r15).
        # This host's lifetime average is ~1.7%; >5% over a bench run
        # means a contended window.
        steal = d.get("steal_pct", -1)
        # Bench writes -1.0 sentinels when its /proc reads failed; an
        # unmeasured window is UNKNOWN, not OK (r15 advice item 4).
        if (ls < 0 or le < 0 or (d.get("load_max") or 0) < 0
                or (steal is not None and steal < 0)):
            print(f"WINDOW UNKNOWN ({src}): health markers unavailable "
                  f"(load_start={ls} load_end={le} "
                  f"load_max={d.get('load_max')} steal={steal}) — "
                  f"/proc reads failed in Bench; treat timings as unvetted")
        elif steal is not None and steal > 5.0:
            print(f"WINDOW SUSPECT ({src}): steal={steal}% of CPU over the "
                  f"run (lifetime avg ~1.7%) — hypervisor-contended window, "
                  f"treat >2.5x movers as probable ghosts")
        elif hot > 0.5 * cpus:
            print(f"WINDOW SUSPECT ({src}): loadavg start={ls} end={le} "
                  f"max={d.get('load_max')} vs {cpus} bench threads — "
                  f"host-contended window, treat >2.5x movers as probable "
                  f"ghosts")
        else:
            print(f"WINDOW OK ({src}): loadavg start={ls} end={le} "
                  f"max={d.get('load_max')}, steal={steal}%, "
                  f"wall={d.get('wall_sec')}s")
    if isinstance(parsed, dict):
        window_suspect(parsed, bench_path)

    corr_path = f"CORRECTNESS_r{rnd:02d}.json"
    try:
        corr = json.load(open(corr_path))
    except FileNotFoundError:
        print(f"GATE RED: {corr_path} missing")
        return 2
    bad = {k: v.get("err") for k, v in corr.items()
           if v.get("err") not in (None, "no_oracle")}
    if bad:
        print(f"GATE RED: {corr_path} has {len(bad)} entries with real errors:")
        for k, e in sorted(bad.items()):
            print(f"  {k}: {str(e)[:120]}")
        ok = False
    not_matching = {k for k, v in corr.items()
                    if v.get("err") is None and not (
                        v.get("rows_match") and v.get("schema_match")
                        and v.get("hash_match"))}
    if not_matching:
        print(f"GATE RED: {corr_path} oracle mismatches: {sorted(not_matching)}")
        ok = False

    prev = f"CORRECTNESS_r{rnd - 1:02d}.json"
    try:
        n_prev = len(json.load(open(prev)))
        if len(corr) < n_prev:
            print(f"GATE RED: {corr_path} has {len(corr)} entries < {prev}'s "
                  f"{n_prev} — queries disappeared from the board")
            ok = False
    except FileNotFoundError:
        pass

    # 4. CORRECTNESS and BENCH must cover the IDENTICAL query-name set
    #    (r6 failure mode: name-level diffs hid failing queries behind
    #    matching counts). The driver's bench line truncates its
    #    per-query map, so the name set comes from the full-map file
    #    Bench writes alongside.
    full = None
    for cand in (f"dev/bench_full_r{rnd:02d}.json", "dev/bench_full_latest.json"):
        try:
            full = json.load(open(cand))
            break
        except FileNotFoundError:
            continue
    if full is None:
        print("GATE RED: no dev/bench_full_r{N}.json / dev/bench_full_latest.json"
              " — cannot cross-check bench vs correctness name sets")
        ok = False
    else:
        window_suspect(full, "full map")
        bnames, cnames = set(full.get("queries", {})), set(corr)
        if bnames != cnames:
            only_b = sorted(bnames - cnames)
            only_c = sorted(cnames - bnames)
            if only_b:
                print(f"GATE RED: {len(only_b)} queries benched but missing a "
                      f"correctness row: {only_b}")
            if only_c:
                print(f"GATE RED: {len(only_c)} queries in correctness but "
                      f"never benched: {only_c}")
            ok = False

    # 5. SURVEY §2 must name every declared query (r8 advice: coverage
    #    grading should not depend on diffing CORRECTNESS keys). Q-names
    #    are table rows "| q_... |" plus the bolded U1/U2 rows.
    import subprocess
    survey = set()
    for line in open("SURVEY.md"):
        m = re.match(r"\|\s*(?:\*\*U\d\*\*\s+)?(q[a-z0-9_]+)\s", line)
        if m:
            survey.add(m.group(1))
    if survey != set(corr):
        only_s = sorted(survey - set(corr))
        only_c = sorted(set(corr) - survey)
        if only_s:
            print(f"GATE RED: {len(only_s)} SURVEY §2 rows with no declared "
                  f"query: {only_s}")
        if only_c:
            print(f"GATE RED: {len(only_c)} declared queries missing a "
                  f"SURVEY §2 row: {only_c}")
        ok = False

    # 5b. dev/plan_audit.txt must cover every declared query (r9 gap:
    #     stale at 218 rows while the board had 226 — the audit went
    #     silently stale the moment a wave landed without rerunning it).
    audit_names = set()
    try:
        for line in open("dev/plan_audit.txt"):
            m = re.match(r"AUDIT\s+(q[a-z0-9_]+)\s", line)
            if m:
                audit_names.add(m.group(1))
    except FileNotFoundError:
        pass
    missing_audit = set(corr) - audit_names
    if missing_audit:
        print(f"GATE RED: {len(missing_audit)} declared queries missing from "
              f"dev/plan_audit.txt: {sorted(missing_audit)[:10]}...")
        ok = False

    # 6. Round artifacts must be COMMITTED, not just present (r6/r7/r8
    #    recurring gap: BENCH/CORRECTNESS untracked at judging time).
    #    EXCEPTION (r15 verdict item 1, third recurrence): the driver
    #    writes the CURRENT round's BENCH/CORRECTNESS/LEAKCHECK/
    #    bench_full_latest/ghost_triage files AFTER the snapshot commit,
    #    so at judging time they are always dirty by construction. Label
    #    those "pending-commit (expected)" instead of RED; only a dirty
    #    artifact from an OLDER round (a real bookkeeping miss) is red.
    st = subprocess.run(["git", "status", "--porcelain"],
                        capture_output=True, text=True).stdout
    cur = (f"BENCH_r{rnd:02d}", f"CORRECTNESS_r{rnd:02d}",
           "LEAKCHECK", "dev/bench_full_latest.json",
           f"dev/ghost_triage_r{rnd:02d}")
    dirty = [l for l in st.splitlines()
             if any(t in l for t in ("BENCH_r", "CORRECTNESS_r",
                                     "LEAKCHECK", "bench_full",
                                     "ghost_triage"))]
    pending = [l for l in dirty if any(t in l for t in cur)]
    stale = [l for l in dirty if l not in pending]
    if pending:
        print("GATE NOTE: current-round artifacts pending-commit (expected "
              "— driver writes them after the snapshot commit):")
        for l in pending:
            print(f"  {l}")
    if stale:
        print("GATE RED: PRIOR-round artifacts uncommitted:")
        for l in stale:
            print(f"  {l}")
        ok = False

    # 7. Ghost-regression triage (r10 verdict item 2): four rounds
    #    running, the judge's only forensic work was explaining one
    #    driver-window timing ghost by hand (r10: q_win_running 1.43 s
    #    driver vs 0.161 s same-code builder A/B). Automate it: diff
    #    this round's full per-query map against the previous round's
    #    COMMITTED map; any query >2.5x its prior time (and >0.5 s, so
    #    timer noise on trivial queries can't flag) gets ONE isolated
    #    re-run through Bench's existing A/B path (SPARK_GRAFT_ONLY —
    #    same code path, same caches, same order as the real bench).
    #    Isolated time back within bound => "ghost" (host-contention
    #    window on the driver run; recorded, not red). Still slow =>
    #    "regression" => RED. Verdicts persist in
    #    dev/ghost_triage_r{N}.json so a re-run of this gate is free.
    if full is not None:
        tri_ok = triage(rnd, full, run="--no-run" not in sys.argv)
        ok = ok and tri_ok

    if ok:
        print(f"GATE GREEN: bench failed:[] and all {len(corr)} correctness "
              f"entries pass or are no-oracle; SURVEY covers all "
              f"{len(survey)} queries; artifacts committed")
    return 0 if ok else 1


def triage(rnd: int, full: dict, run: bool = True) -> bool:
    import os
    import subprocess
    # The builder writes dev/bench_full_r{N}_dev.json (sometimes with a
    # board-size suffix like _dev_393); try all r{N-1} variants and take
    # the one covering the most queries (r14 verdict item 2: the plain
    # name never exists, so the triage diff skipped every round).
    import glob
    cands = ([f"dev/bench_full_r{rnd - 1:02d}.json"]
             + sorted(glob.glob(f"dev/bench_full_r{rnd - 1:02d}_dev*.json")))
    loaded = []
    for c in cands:
        try:
            loaded.append((c, json.load(open(c))))
        except FileNotFoundError:
            continue
    # Prefer priors at the SAME scale factor (r15 advice item 2: a
    # larger different-SF _dev variant, e.g. an sf1 map, would shadow a
    # smaller same-SF one and the sf-mismatch check below then skipped
    # triage entirely). Fall back to all candidates only if none match.
    same_sf = [(c, d) for c, d in loaded if d.get("sf") == full.get("sf")]
    pool = same_sf or loaded
    prev, prev_path = None, cands[0]
    for c, d in pool:
        if prev is None or len(d.get("queries", {})) > len(prev.get("queries", {})):
            prev, prev_path = d, c
    if prev is None:
        print(f"TRIAGE SKIP: none of {cands} present — no prior map to diff")
        return True
    print(f"TRIAGE: diffing against {prev_path} "
          f"({len(prev.get('queries', {}))} queries)")
    if prev.get("sf") != full.get("sf"):
        print(f"TRIAGE SKIP: sf mismatch ({prev.get('sf')} vs "
              f"{full.get('sf')}) — cross-SF timing diffs are meaningless")
        return True
    pq, cq = prev.get("queries", {}), full.get("queries", {})
    flagged = sorted(q for q, t in cq.items()
                     if q in pq and t > 0.5 and t > 2.5 * pq[q])
    if not flagged:
        print(f"TRIAGE GREEN: no query >2.5x its r{rnd - 1} time "
              f"(of {len(set(cq) & set(pq))} comparable)")
        return True

    out_path = f"dev/ghost_triage_r{rnd:02d}.json"
    verdicts = {}
    try:
        verdicts = json.load(open(out_path))
    except FileNotFoundError:
        pass
    # 'inconclusive' verdicts (failed isolated run) stay in todo so the
    # next gate run retries them instead of reusing a broken verdict
    todo = [q for q in flagged
            if verdicts.get(q, {}).get("verdict") not in ("ghost", "regression")]
    if todo and not run:
        print(f"TRIAGE RED (unresolved): {len(todo)} flagged, re-run without "
              f"--no-run or manually:\n  SPARK_GRAFT_SF_DIR={full['sf']} "
              f"SPARK_GRAFT_ONLY={','.join(todo)} sbt -batch 'runMain graft.Bench'")
        return False
    if todo:
        print(f"TRIAGE: {len(todo)} queries >2.5x prior ({todo}) — isolated "
              f"re-run via SPARK_GRAFT_ONLY...")
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=full["sf"],
                   SPARK_GRAFT_ONLY=",".join(todo))
        # A builder session may have SPARK_GRAFT_BENCH_OUT exported; if
        # inherited here, the triage's tiny filtered map would clobber
        # the A/B comparison artifact (the r9 clobber class the Bench
        # write-guard exists to prevent). r15 advice item 1.
        env.pop("SPARK_GRAFT_BENCH_OUT", None)
        r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                           env=env, capture_output=True, text=True)
        iso = {}
        for line in r.stdout.splitlines():
            if '"metric"' in line:
                iso = json.loads(line[line.index("{"):]).get("queries", {})
        for q in todo:
            it = iso.get(q)
            if r.returncode != 0 or it is None:
                # do NOT persist 'regression' on an infra failure (OOM,
                # flake): 'inconclusive' is retried by the next gate run
                verdicts[q] = {"prior": pq[q], "driver": cq[q],
                               "isolated": None, "verdict": "inconclusive",
                               "note": f"isolated run rc={r.returncode}, "
                                       f"timing {'missing' if it is None else it}"}
            else:
                ghost = it <= 2.5 * pq[q] + 0.3
                verdicts[q] = {"prior": pq[q], "driver": cq[q],
                               "isolated": it,
                               "verdict": "ghost" if ghost else "regression"}
        json.dump(verdicts, open(out_path, "w"), indent=1, sort_keys=True)
    bad = sorted(q for q in flagged if verdicts[q]["verdict"] == "regression")
    unresolved = sorted(q for q in flagged
                        if verdicts[q]["verdict"] == "inconclusive")
    for q in flagged:
        v = verdicts[q]
        print(f"  TRIAGE {q}: prior {v['prior']}s, driver {v['driver']}s, "
              f"isolated {v['isolated']}s -> {v['verdict']}")
    if bad:
        print(f"TRIAGE RED: {len(bad)} real regressions confirmed by isolated "
              f"re-run: {bad}")
        return False
    if unresolved:
        print(f"TRIAGE RED (inconclusive): isolated re-run failed for "
              f"{unresolved} — rerun the gate (verdicts not persisted as red)")
        return False
    print(f"TRIAGE GREEN: all {len(flagged)} flagged queries are driver-window "
          f"ghosts (isolated re-run within bound; {out_path})")
    return True


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1])))

"""Crash-consistency of the resumable manifest across a REAL ``kill -9``.

``test_manifest.py`` simulates the crash with a graceful early return
(``max_buckets=3``) — the process exits cleanly between waves, so the
on-disk state it resumes from is always a committed prefix. The north
rule's resumability clause ("every stage resumable from a checkpointed
manifest") is about the OTHER case: an executor/driver death in the
MIDDLE of a wave's write job, leaving

  * a lease file whose holder no longer exists,
  * partially-written bucket directories with no manifest entry
    (parquet part files and/or staging dirs from the killed job),
  * a manifest holding only the previously committed wave.

This test produces that state for real: process A commits a 3-bucket
wave, starts the remaining 5-bucket wave, and is SIGKILLed as soon as
the write job's staging appears under the output root. The test then
plants a deterministic crash crumb — a schema-valid parquet file under
a PENDING bucket's ``sink=bogus`` partition — so the uncommitted-dir
cleanup in ``manifest._run_wave`` is exercised on every run regardless
of where the kill landed (dynamic partition overwrite alone would NOT
remove it: it only replaces partitions the re-run produces, which is
exactly why the cleanup exists). Process B (fresh interpreter + JVM)
then pins, in order:

  1. the killed wave's lease BLOCKS a resume at the default TTL
     (``ConcurrentWaveError`` — a live wave must not be stomped just
     because a second one started),
  2. a short-TTL resume STEALS the stale lease and completes,
  3. the final output equals a single-shot ``run_pipeline`` run
     byte-for-byte in BOTH ``exceptAll`` directions (multiplicity-
     aware: a surviving partial bucket would double rows and fail
     this, not just change counts),
  4. no ``sink=bogus`` row survives (the planted crumb was cleaned),
  5. the manifest holds all 8 units exactly once and its lineage
     totals (``rows_in``, per-sink rows) match the physical output.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# big enough that the second wave's write job (grok + enrich + route
# over ~5/8 of the rows) runs for several seconds on local[4] — the
# staging-dir poll below kills within ~50ms of the job starting, so
# the kill lands mid-write with wide margin
N_ROWS = 150_000
N_CONVS = 64

_COMMON = f"""
import sys
from logpipe.manifest import run_resumable
from logpipe.session import get_spark
from logpipe.synth import synth_k8s_meta, synth_tool_meta, synth_transcripts

out_base, mdir = sys.argv[1], sys.argv[2]
spark = get_spark(app_name=sys.argv[0], master="local[4]",
                  shuffle_partitions=8)
t = synth_transcripts(spark, n_rows={N_ROWS}, n_convs={N_CONVS})
k8s = synth_k8s_meta(spark, n_convs={N_CONVS})
tool = synth_tool_meta(spark, n_tools=16)
"""

_WRITER_SCRIPT = _COMMON + """
import pathlib

# wave 1: 3 of 8 buckets, committed cleanly
run_resumable(spark, t, k8s, tool, out_base, mdir,
              n_buckets=8, max_buckets=3)
pathlib.Path(sys.argv[3]).touch()  # wave1-done marker for the test
# wave 2: the remaining 5 — the test SIGKILLs this process as soon as
# the write job's staging appears under out_base
run_resumable(spark, t, k8s, tool, out_base, mdir, n_buckets=8)
pathlib.Path(sys.argv[4]).touch()  # only reached if the kill missed
"""

_RESUMER_SCRIPT = _COMMON + """
import json as _json

from pyspark.sql import functions as F

from logpipe.manifest import ConcurrentWaveError
from logpipe.plans.pipeline import run_pipeline

# 1. the killed wave's lease is still on disk and far younger than the
#    default TTL: a resume must refuse, not stomp a possibly-live wave
try:
    run_resumable(spark, t, k8s, tool, out_base, mdir, n_buckets=8)
    lease_blocked = False
except ConcurrentWaveError:
    lease_blocked = True

# 2. short TTL: the lease is presumed crashed (it is) and stolen
m = run_resumable(spark, t, k8s, tool, out_base, mdir,
                  n_buckets=8, lease_ttl_sec=1.0)

back = spark.read.option("basePath", out_base).parquet(out_base + "/bucket=*")
cols = ["sink", "source", "id", "stream", "content", "timestamp"]
single = run_pipeline(t, k8s, tool).select(cols)
totals = m.totals()
sink_rows = {
    r["sink"]: r["n"]
    for r in back.groupBy("sink")
    .agg(F.count(F.lit(1)).alias("n"))
    .collect()
}
print("CRASH_RESULT " + _json.dumps({
    "lease_blocked_at_default_ttl": lease_blocked,
    "entries": len(m.entries()),
    "unique_units": len({e["bucket"] for e in m.entries()}),
    "missing_vs_single": single.exceptAll(back.select(cols)).count(),
    "extra_vs_single": back.select(cols).exceptAll(single).count(),
    "bogus_rows": back.filter(back.sink == "bogus").count(),
    "rows_in_total": totals["rows_in"],
    "input_rows": t.count(),
    "manifest_sink_rows": {s: v["rows"] for s, v in totals["sinks"].items()},
    "physical_sink_rows": sink_rows,
}))
spark.stop()
"""


def _staging_present(out_base: str) -> bool:
    """A Spark write job is in flight under out_base: the dynamic-
    overwrite committer stages into hidden ``.spark-staging-*`` /
    ``_temporary`` entries at the output root."""
    try:
        names = os.listdir(out_base)
    except FileNotFoundError:
        return False
    return any(
        n.startswith(".spark-staging") or n == "_temporary" for n in names
    )


def test_resume_after_real_sigkill(tmp_path):
    out_base = str(tmp_path / "out")
    mdir = str(tmp_path / "manifest")
    wave1_done = str(tmp_path / "wave1_done")
    wave2_done = str(tmp_path / "wave2_done")
    env = dict(os.environ, PYTHONPATH=REPO)

    # writer output goes to FILES, not pipes: the JVM inherits these
    # descriptors and its log volume must never block on a full pipe
    # buffer while we wait on filesystem markers
    writer_log = str(tmp_path / "writer.log")
    with open(writer_log, "wb") as log_fh:
        proc = subprocess.Popen(
            [sys.executable, "-c", _WRITER_SCRIPT,
             out_base, mdir, wave1_done, wave2_done],
            stdout=log_fh, stderr=subprocess.STDOUT, env=env, cwd=REPO,
        )
    try:
        deadline = time.time() + 300
        while not os.path.exists(wave1_done):
            assert proc.poll() is None, (
                "writer died before wave 1 committed: "
                + open(writer_log, "rb").read().decode(errors="replace")[-3000:]
            )
            assert time.time() < deadline, "wave 1 did not commit in 300s"
            time.sleep(0.05)
        # wave 2 is now starting: kill the instant its write job stages
        deadline = time.time() + 120
        while not _staging_present(out_base):
            if os.path.exists(wave2_done) or proc.poll() is not None:
                raise AssertionError(
                    "wave 2 finished before a kill could land mid-write "
                    "— enlarge N_ROWS"
                )
            assert time.time() < deadline, "wave 2 never started writing"
            time.sleep(0.02)
        os.kill(proc.pid, signal.SIGKILL)
    finally:
        proc.kill()
        proc.wait()

    # the crash state this test exists for: a committed prefix, a
    # stale lease, and NO record of the killed wave
    from logpipe.manifest import Manifest

    entries = Manifest(mdir).entries()
    assert 3 <= len(entries) < 8, [e["bucket"] for e in entries]
    assert os.path.exists(os.path.join(mdir, "_lease"))

    # plant the deterministic crash crumb: a schema-valid parquet file
    # in a PENDING bucket's sink=bogus partition (simulates a partial
    # commit the killed job left behind; survives unless the resume's
    # uncommitted-dir cleanup removes the whole bucket dir)
    done = {e["bucket"] for e in entries}
    pending_bucket = max(set(range(8)) - done)
    donor = sorted(
        glob.glob(f"{out_base}/bucket={min(done)}/sink=*/part-*.parquet")
    )
    assert donor, "committed wave left no parquet part files"
    crumb_dir = f"{out_base}/bucket={pending_bucket}/sink=bogus"
    os.makedirs(crumb_dir, exist_ok=True)
    shutil.copy(donor[0], os.path.join(crumb_dir, "part-00000.parquet"))

    b = subprocess.run(
        [sys.executable, "-c", _RESUMER_SCRIPT, out_base, mdir],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert b.returncode == 0, b.stderr[-3000:]
    line = [l for l in b.stdout.splitlines() if l.startswith("CRASH_RESULT ")]
    assert line, b.stdout[-2000:]
    res = json.loads(line[-1][len("CRASH_RESULT "):])

    assert res["lease_blocked_at_default_ttl"] is True
    assert res["entries"] == 8 and res["unique_units"] == 8
    assert res["missing_vs_single"] == 0 and res["extra_vs_single"] == 0
    assert res["bogus_rows"] == 0
    assert res["rows_in_total"] == res["input_rows"] == N_ROWS
    assert res["manifest_sink_rows"] == res["physical_sink_rows"]

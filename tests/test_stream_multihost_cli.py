"""Simulated 2-host `findkmer stream` via CLI: per-host partial spectra
merged with `findkmer merge` equal the single-host spectrum
(BASELINE config 5 shape, simulated hosts — SURVEY.md §4.2)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(args, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "-m", "findkmer_tpu.cli"] + args,
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=300,
    )
    assert r.returncode == 0, r.stderr
    return r.stdout


def test_two_simulated_hosts_merge(tmp_path, fixtures_dir):
    src = os.path.join(fixtures_dir, "ecoli_frag.fa")
    common = ["-k", "6", "--chunk-len", "1024", "--batch-rows", "4"]

    _cli(["stream", "-i", src, *common, "--num-processes", "2",
          "--process-id", "0", "-o", "h0.tsv"], tmp_path)
    _cli(["stream", "-i", src, *common, "--num-processes", "2",
          "--process-id", "1", "-o", "h1.tsv"], tmp_path)
    merged = _cli(["merge", "-i", "h0.tsv", "h1.tsv"], tmp_path)

    single = _cli(["count", "-i", src, *common], tmp_path)
    assert merged == single


def test_host_resume_composes_with_sharding(tmp_path, fixtures_dir):
    src = os.path.join(fixtures_dir, "ecoli_frag.fa")
    common = ["-k", "5", "--chunk-len", "1024", "--batch-rows", "2"]

    # host 1 of 2 with checkpointing, run twice (second is a full resume)
    a = _cli(["stream", "-i", src, *common, "--num-processes", "2",
              "--process-id", "1", "--checkpoint", "ck",
              "--checkpoint-every", "2"], tmp_path)
    b = _cli(["stream", "-i", src, *common, "--num-processes", "2",
              "--process-id", "1", "--checkpoint", "ck"], tmp_path)
    assert a == b

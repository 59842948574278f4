"""Multi-run sweep launcher.

Replaces the reference's XManager/Vertex-AI cloud launcher (reference
baselines/launch.py:162-241) with a local process-pool fan-out: one
`baselines.train` process per hyperparameter sweep point, each with its own
output directory.  The sweep itself is identical (`config.get_sweep`,
reference baselines/config.py:96-101).

Usage:
  python -m baselines.launch --config baselines/config.py \
      --output_dir /tmp/qhbm_sweep --max_parallel 2 [--dry_run]
  python -m baselines.launch ... --sweep_filter training.method=vanilla
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def tpu_topology_info(topology: str):
  """(num_chips, num_hosts, mesh_plan) for a TPU topology string.

  Parity with the reference's topology->cores inference
  (reference baselines/launch.py:126-139: cores = 2 * prod(topology)); here
  the useful outputs are chip/host counts and a default
  ('data','state') mesh plan consumed by `parallel.topology.ici_mesh`.
  Accepts '2x2', '4x4', '2x2x4', etc.  Hosts control 4 chips each (the
  standard TPU-VM arrangement); multi-host jobs start one process per host
  with `--distributed` (jax.distributed.initialize).
  """
  dims = [int(x) for x in topology.lower().split("x")]
  if not dims or any(d < 1 for d in dims):
    raise ValueError(f"bad tpu topology {topology!r}")
  chips = 1
  for d in dims:
    chips *= d
  hosts = max(1, chips // 4)
  # Default mesh: amplitude sharding needs a power-of-two 'state' axis, so
  # use the largest power of two DIVIDING the chip count and put the rest on
  # 'data' -- data*state == chips always (the previous floor-divide plan
  # silently idled chips on non-power-of-two topologies like 2x3).
  state = chips & (-chips)
  data = chips // state
  assert data * state == chips
  return chips, hosts, {"data": data, "state": state}


def build_jobs(config_path: str, output_dir: str, sweep, seed: int,
               tpu_topology: str = None):
  jobs = []
  for i, point in enumerate(sweep):
    label = "_".join(str(v) for v in point.values()) or f"point_{i}"
    job_dir = os.path.join(output_dir, f"{i:03d}_{label}")
    cmd = [
        sys.executable, "-m", "baselines.train",
        f"--config={config_path}",
        f"--output_dir={job_dir}",
        f"--seed={seed}",
    ]
    if tpu_topology:
      chips, hosts, plan = tpu_topology_info(tpu_topology)
      cmd.append("--distributed")
      cmd.append(f"--mesh={plan['data']}x{plan['state']}")
      if hosts > 1:
        # The local pool runs this command once; on a real multi-host slice
        # the same command runs on every host (jax.distributed infers
        # coordinator/process ids from the TPU metadata).
        cmd.append(f"--num_hosts={hosts}")
    for flag, value in point.items():
      cmd.append(f"--{flag}={value}")
    jobs.append((job_dir, cmd))
  return jobs


def main():
  from absl import app, flags
  import importlib.util

  config_path_flag = flags.DEFINE_string(
      "config", os.path.join(os.path.dirname(__file__), "config.py"),
      "Path to the config module providing get_config()/get_sweep().")
  output_flag = flags.DEFINE_string("output_dir", "/tmp/qhbm_sweep",
                                    "Root output directory for all jobs.")
  parallel_flag = flags.DEFINE_integer("max_parallel", 1,
                                       "Concurrent training processes.")
  dry_flag = flags.DEFINE_bool("dry_run", False,
                               "Print the job commands without running.")
  filter_flag = flags.DEFINE_multi_string(
      "sweep_filter", [],
      "key=value filters on sweep points (e.g. training.method=vanilla).")
  seed_flag = flags.DEFINE_integer("seed", 42, "Random seed for all jobs.")
  retries_flag = flags.DEFINE_integer(
      "retries", 0, "Automatic retries per failed job (the reference's "
      "XManager jobs were fire-and-forget with no retry).")
  topology_flag = flags.DEFINE_string(
      "tpu_topology", None,
      "TPU topology string (e.g. '2x2', '4x4'); jobs get --distributed and "
      "a ('data','state') mesh plan inferred from the chip count (parity "
      "with reference launch.py:126-139,202-214).")
  cloud_flag = flags.DEFINE_bool(
      "emit_cloud_specs", False,
      "Instead of running locally, write per-sweep-point cloud TPU job "
      "specs (gcloud tpu-vm commands + GKE JobSet manifests) to "
      "output_dir (the reference's XManager/Vertex job fan-out, "
      "reference launch.py:162-241, as dry-run artifacts).")
  generation_flag = flags.DEFINE_string(
      "tpu_generation", "v5e", "TPU generation for cloud specs "
      "(v5e/v5p/v4; decides the accelerator-type string).")

  def run(argv):
    del argv
    spec = importlib.util.spec_from_file_location("sweep_config",
                                                  config_path_flag.value)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sweep = mod.get_sweep()
    for f in filter_flag.value:
      k, v = f.split("=", 1)
      sweep = [p for p in sweep if str(p.get(f"config.{k}", "")) == v]
    os.makedirs(output_flag.value, exist_ok=True)
    if cloud_flag.value:
      from baselines import cloud
      if not topology_flag.value:
        raise ValueError("--emit_cloud_specs requires --tpu_topology")
      specs = cloud.build_cloud_jobs(
          config_path_flag.value, output_flag.value, sweep, seed_flag.value,
          topology=topology_flag.value, generation=generation_flag.value)
      path = cloud.write_specs(specs, output_flag.value)
      print(f"{len(specs)} cloud job specs -> {path}")
      return
    jobs = build_jobs(config_path_flag.value, output_flag.value, sweep,
                      seed_flag.value, tpu_topology=topology_flag.value)
    manifest = [{"dir": d, "cmd": c} for d, c in jobs]
    with open(os.path.join(output_flag.value, "sweep_manifest.json"),
              "w") as fp:
      json.dump(manifest, fp, indent=2)
    print(f"{len(jobs)} sweep points")
    if dry_flag.value:
      for d, c in jobs:
        print(" ", " ".join(c))
      return

    running = []
    results = {}
    attempts = {}
    queue = [(d, c) for d, c in jobs]
    while queue or running:
      while queue and len(running) < parallel_flag.value:
        job_dir, cmd = queue.pop(0)
        os.makedirs(job_dir, exist_ok=True)
        attempt = attempts.get(job_dir, 0)
        log = open(os.path.join(job_dir, f"stdout_attempt{attempt}.log"), "w")
        proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT)
        running.append((job_dir, cmd, proc, log))
        print(f"launched {job_dir} (pid {proc.pid}, attempt {attempt})")
      still = []
      for job_dir, cmd, proc, log in running:
        code = proc.poll()
        if code is None:
          still.append((job_dir, cmd, proc, log))
          continue
        log.close()
        if code != 0 and attempts.get(job_dir, 0) < retries_flag.value:
          attempts[job_dir] = attempts.get(job_dir, 0) + 1
          print(f"retrying {job_dir} (exit {code}, "
                f"attempt {attempts[job_dir]})")
          queue.append((job_dir, cmd))
        else:
          results[job_dir] = code
          print(f"finished {job_dir} (exit {code})")
      running = still
      if running:
        import time
        time.sleep(2.0)
    failures = {d: c for d, c in results.items() if c != 0}
    if failures:
      print(f"FAILED jobs: {json.dumps(failures, indent=2)}")
      sys.exit(1)
    print("all jobs succeeded")

  app.run(run)


if __name__ == "__main__":
  main()

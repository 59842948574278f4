"""Cloud TPU job-spec generation for sweep launches.

The reference launched sweeps as XManager/Vertex-AI jobs: a Docker
container spec with the library installed, a TPU topology resourced per
job, and one job per hyperparameter sweep point (reference
baselines/launch.py:162-241).  This module is the TPU-native counterpart:
it GENERATES the per-sweep-point specs for real TPU slices -- a
`gcloud compute tpus tpu-vm` provisioning command plus a per-host worker
command, and a GKE JobSet-style manifest -- without submitting anything
(this environment has no cloud control plane; the specs are dry-run
artifacts consumed by `gcloud`/`kubectl` on a cloud workstation).

Entry points:
  * build_cloud_jobs(...): list of per-point spec dicts.
  * write_specs(...): writes cloud_specs.json + one GKE YAML per point.
  * `python -m baselines.launch --emit_cloud_specs --tpu_topology 4x4 ...`
"""

from __future__ import annotations

import json
import os
import shlex
from typing import Dict, List

from baselines import launch as launch_lib

# chips per accelerator-type unit: v5litepod-N / v5p-N count CORES (2/chip
# on v5p, 1/chip on v5e); the public naming convention is the suffix being
# the chip count for v5e and the core count for v4/v5p.
_GENERATIONS = {
    "v5e": {"prefix": "v5litepod", "cores_per_chip": 1},
    "v5p": {"prefix": "v5p", "cores_per_chip": 2},
    "v4": {"prefix": "v4", "cores_per_chip": 2},
}


def accelerator_type(topology: str, generation: str = "v5e") -> str:
  """gcloud accelerator-type string for a topology, e.g. '2x4' ->
  'v5litepod-8' (v5e counts chips) or 'v5p-16' (v5p counts cores).

  Mirrors the reference's topology->core-count inference
  (reference baselines/launch.py:126-139: cores = 2 * prod(topology))."""
  if generation not in _GENERATIONS:
    raise ValueError(f"unknown TPU generation {generation!r}; "
                     f"one of {sorted(_GENERATIONS)}")
  chips, _, _ = launch_lib.tpu_topology_info(topology)
  gen = _GENERATIONS[generation]
  return f"{gen['prefix']}-{chips * gen['cores_per_chip']}"


def _train_command(config_path: str, job_dir: str, seed: int, point: Dict,
                   mesh_plan: Dict[str, int], num_hosts: int) -> List[str]:
  """The same per-point train command the local pool runs
  (launch.build_jobs), addressed at the remote checkout."""
  cmd = [
      "python", "-m", "baselines.train",
      f"--config={config_path}",
      f"--output_dir={job_dir}",
      f"--seed={seed}",
      "--distributed",
      f"--mesh={mesh_plan['data']}x{mesh_plan['state']}",
  ]
  if num_hosts > 1:
    cmd.append(f"--num_hosts={num_hosts}")
  for flag, value in point.items():
    cmd.append(f"--{flag}={value}")
  return cmd


def _startup_script(wheel_uri: str, train_cmd: List[str]) -> str:
  """Per-host bootstrap: install the wheel (the reference's container
  poetry-install step, reference launch.py:171-200) then run training.
  jax.distributed infers coordinator/process ids from TPU metadata, so
  the same script runs unchanged on every host of the slice."""
  return "\n".join([
      "#!/bin/bash",
      "set -euo pipefail",
      f"pip install --quiet {shlex.quote(wheel_uri)}",
      " ".join(shlex.quote(c) for c in train_cmd),
  ])


def build_cloud_jobs(config_path: str,
                     output_dir: str,
                     sweep,
                     seed: int,
                     topology: str,
                     generation: str = "v5e",
                     project: str = "my-project",
                     zone: str = "us-central1-a",
                     image: str = "python:3.11",
                     wheel_uri: str = "qhbmlib-tpu",
                     runtime_version: str = "tpu-ubuntu2204-base"
                     ) -> List[Dict]:
  """One spec per sweep point: gcloud provisioning + per-host worker
  command + a GKE JobSet-style manifest (one replicated job per host)."""
  chips, hosts, plan = launch_lib.tpu_topology_info(topology)
  acc = accelerator_type(topology, generation)
  specs = []
  for i, point in enumerate(sweep):
    label = "_".join(str(v) for v in point.values()) or f"point_{i}"
    # TPU/K8s resource names: lowercase alphanumerics and dashes.
    safe = "".join(c if c.isalnum() else "-" for c in label.lower())
    name = f"qhbm-sweep-{i:03d}-{safe}"[:62].rstrip("-")
    job_dir = os.path.join(output_dir, f"{i:03d}_{label}")
    train_cmd = _train_command(config_path, job_dir, seed, point, plan,
                               hosts)
    startup = _startup_script(wheel_uri, train_cmd)
    gcloud_create = [
        "gcloud", "compute", "tpus", "tpu-vm", "create", name,
        f"--project={project}", f"--zone={zone}",
        f"--accelerator-type={acc}", f"--version={runtime_version}",
    ]
    # --worker=all fans the same command out to every host; process ids
    # come from the TPU metadata server (jax.distributed.initialize()).
    gcloud_run = [
        "gcloud", "compute", "tpus", "tpu-vm", "ssh", name,
        f"--project={project}", f"--zone={zone}", "--worker=all",
        "--command", " ".join(shlex.quote(c) for c in train_cmd),
    ]
    manifest = {
        "apiVersion": "jobset.x-k8s.io/v1alpha2",
        "kind": "JobSet",
        "metadata": {"name": name},
        "spec": {
            "replicatedJobs": [{
                "name": "workers",
                "replicas": 1,
                "template": {
                    "spec": {
                        "parallelism": hosts,
                        "completions": hosts,
                        "backoffLimit": 0,
                        "template": {
                            "spec": {
                                "nodeSelector": {
                                    "cloud.google.com/gke-tpu-accelerator":
                                        acc,
                                    "cloud.google.com/gke-tpu-topology":
                                        topology,
                                },
                                "containers": [{
                                    "name": "train",
                                    "image": image,
                                    "command": ["bash", "-c", startup],
                                    "resources": {
                                        "limits": {
                                            "google.com/tpu":
                                                chips // hosts,
                                        },
                                    },
                                }],
                                "restartPolicy": "Never",
                            },
                        },
                    },
                },
            }],
        },
    }
    specs.append({
        "name": name,
        "point": dict(point),
        "job_dir": job_dir,
        "topology": topology,
        "accelerator_type": acc,
        "num_chips": chips,
        "num_hosts": hosts,
        "mesh_plan": plan,
        "train_cmd": train_cmd,
        "gcloud_create_cmd": gcloud_create,
        "gcloud_run_cmd": gcloud_run,
        "gcloud_delete_cmd": [
            "gcloud", "compute", "tpus", "tpu-vm", "delete", name,
            f"--project={project}", f"--zone={zone}", "--quiet",
        ],
        "gke_manifest": manifest,
    })
  return specs


def _yaml_dump(obj, indent=0) -> str:
  """Minimal YAML emitter (dicts/lists/scalars) -- avoids a pyyaml
  dependency for what is a write-only artifact."""
  pad = "  " * indent
  if isinstance(obj, dict):
    if not obj:
      return pad + "{}"
    lines = []
    for k, v in obj.items():
      if isinstance(v, (dict, list)) and v:
        lines.append(f"{pad}{k}:")
        lines.append(_yaml_dump(v, indent + 1))
      else:
        lines.append(f"{pad}{k}: {_scalar(v)}")
    return "\n".join(lines)
  if isinstance(obj, list):
    if not obj:
      return pad + "[]"
    lines = []
    for v in obj:
      if isinstance(v, (dict, list)) and v:
        body = _yaml_dump(v, indent + 1)
        first, _, rest = body.partition("\n")
        lines.append(f"{pad}- {first.lstrip()}")
        if rest:
          lines.append(rest)
      else:
        lines.append(f"{pad}- {_scalar(v)}")
    return "\n".join(lines)
  return pad + _scalar(obj)


def _scalar(v) -> str:
  if isinstance(v, bool):
    return "true" if v else "false"
  if isinstance(v, (int, float)):
    return str(v)
  s = str(v)
  if s == "" or any(ch in s for ch in ":#{}[],&*!|>'\"%@`\n"):
    return json.dumps(s)
  return s


def write_specs(specs: List[Dict], output_dir: str) -> str:
  """cloud_specs.json (everything) + one GKE YAML per sweep point."""
  os.makedirs(output_dir, exist_ok=True)
  path = os.path.join(output_dir, "cloud_specs.json")
  with open(path, "w") as fp:
    json.dump(specs, fp, indent=2)
  for spec in specs:
    ypath = os.path.join(output_dir, f"{spec['name']}.yaml")
    with open(ypath, "w") as fp:
      fp.write(_yaml_dump(spec["gke_manifest"]) + "\n")
  return path

"""Cloud TPU job-spec generation (baselines/cloud.py) — the dry-run
counterpart of the reference's XManager/Vertex job fan-out (reference
baselines/launch.py:162-241)."""

import json
import os

import pytest

from baselines import cloud, config as config_module, launch


def test_accelerator_type_by_generation():
  assert cloud.accelerator_type("2x4", "v5e") == "v5litepod-8"
  assert cloud.accelerator_type("2x4", "v5p") == "v5p-16"
  assert cloud.accelerator_type("2x2", "v4") == "v4-8"
  with pytest.raises(ValueError):
    cloud.accelerator_type("2x2", "v6z")


def _specs(tmp_path, topology="4x4", generation="v5e"):
  sweep = config_module.get_sweep()
  return sweep, cloud.build_cloud_jobs(
      "baselines/config.py", str(tmp_path), sweep, seed=7,
      topology=topology, generation=generation, project="proj",
      zone="us-central2-b")


def test_one_spec_per_sweep_point(tmp_path):
  sweep, specs = _specs(tmp_path)
  assert len(specs) == len(sweep)
  assert len({s["name"] for s in specs}) == len(specs)  # unique job names


def test_spec_resources_match_topology(tmp_path):
  _, specs = _specs(tmp_path, topology="4x4")
  chips, hosts, plan = launch.tpu_topology_info("4x4")
  for s in specs:
    assert s["accelerator_type"] == "v5litepod-16"
    assert s["num_chips"] == chips and s["num_hosts"] == hosts
    assert s["mesh_plan"] == plan
    pod = (s["gke_manifest"]["spec"]["replicatedJobs"][0]["template"]
           ["spec"])
    assert pod["parallelism"] == hosts and pod["completions"] == hosts
    container = pod["template"]["spec"]["containers"][0]
    assert container["resources"]["limits"]["google.com/tpu"] == (
        chips // hosts)
    selector = pod["template"]["spec"]["nodeSelector"]
    assert selector["cloud.google.com/gke-tpu-topology"] == "4x4"


def test_train_cmd_matches_local_launcher(tmp_path):
  """The per-point remote command must be flag-for-flag the local pool's
  command (modulo the interpreter path)."""
  sweep, specs = _specs(tmp_path, topology="2x2")
  local = launch.build_jobs("baselines/config.py", str(tmp_path), sweep,
                            seed=7, tpu_topology="2x2")
  for spec, (_, local_cmd) in zip(specs, local):
    assert spec["train_cmd"][1:] == local_cmd[1:]
    # And the gcloud run command embeds that exact command.
    joined = " ".join(spec["gcloud_run_cmd"])
    assert "baselines.train" in joined
    for flag in spec["train_cmd"][2:]:
      assert flag in joined


def test_write_specs_emits_json_and_yaml(tmp_path):
  _, specs = _specs(tmp_path)
  path = cloud.write_specs(specs, str(tmp_path))
  with open(path) as f:
    loaded = json.load(f)
  assert [s["name"] for s in loaded] == [s["name"] for s in specs]
  for s in specs:
    ypath = os.path.join(str(tmp_path), f"{s['name']}.yaml")
    assert os.path.exists(ypath)
    text = open(ypath).read()
    assert "JobSet" in text and s["accelerator_type"] in text


def test_yaml_dump_roundtrips_with_pyyaml_if_available(tmp_path):
  yaml = pytest.importorskip("yaml")
  _, specs = _specs(tmp_path, topology="2x4")
  text = cloud._yaml_dump(specs[0]["gke_manifest"])
  assert yaml.safe_load(text) == specs[0]["gke_manifest"]

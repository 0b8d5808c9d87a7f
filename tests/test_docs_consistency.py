"""Doc-drift guard (VERDICT r4 item 8 / weak #1): the handful of
load-bearing claims in README/DESIGN/module docstrings are checked against
the code's actual flags and surfaces, so a fast round can't silently
invalidate the docs again (round 4 shipped three now-false sentences)."""
import inspect
import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _read(name):
    return (ROOT / name).read_text()


def test_bench_emits_the_documented_lane_keys():
    """bench.py's driver-visible JSON must carry exactly the documented
    rate lanes (BENCH_NOTES/VERDICT track them by name across rounds)."""
    src = _read("bench.py")
    keys = set(re.findall(r'rates\["(\w+)"\]\s*=', src))
    assert keys == {
        "engine", "pallas_episode", "fused_ppo", "fused_ppo_towers", "cjp",
        "cjp_pallas",
    }, keys
    # the towers band verdict and the dispersion guard ship in the JSON
    assert 'out["towers_band"]' in src
    assert 'out["timing_dispersion"]' in src


def test_separate_towers_run_fused_claim_matches_code():
    """fused_ppo's header says separate pi/vf towers run fused (split_at
    mode); the code must actually have the mode and PPOConfig the flag."""
    from mbt_gym_tpu.agents import ppo
    from mbt_gym_tpu.ops import fused_ppo

    doc = fused_ppo.__doc__
    assert "stay on the XLA path" not in doc  # the round-4 false claim
    assert "split_at" in doc
    assert "split_at" in inspect.getsource(fused_ppo.ppo_fused_grads_T)
    assert "shared_trunk" in {f.name for f in ppo.PPOConfig.__dataclass_fields__.values()}
    # bench.py measures the towers lane through that flag
    assert "shared_trunk=False" in _read("bench.py")


def test_design_doc_tracks_the_table_kernel_resolution():
    """DESIGN.md's CJP negative result must point at the round-4 table
    kernel that superseded it (VERDICT r4 weak #1)."""
    design = _read("DESIGN.md")
    assert "table_rollout_pallas" in design
    # the round-2 diagnosis must stay marked as superseded (removing the
    # correction re-creates the round-4 drift)
    assert "turned out to be WRONG" in design
    # the fused-pipeline figure is quoted as current (~195M), not 154M
    assert "154M (BENCH_NOTES.md)" not in design


def test_front_door_defaults_match_readme():
    """README documents backend="auto" as the default on the public entry
    points; the signatures must agree (and dispatch_report must exist)."""
    import mbt_gym_tpu
    from mbt_gym_tpu.agents import ppo
    from mbt_gym_tpu.rollout import mc_episode_stats, rollout

    readme = _read("README.md")
    assert 'backend="auto"' in readme and "dispatch_report" in readme
    assert inspect.signature(rollout).parameters["backend"].default == "auto"
    assert inspect.signature(mc_episode_stats).parameters["backend"].default == "auto"
    assert (
        inspect.signature(ppo.evaluate_policy.__wrapped__).parameters["backend"].default
        == "auto"
    )
    assert callable(mbt_gym_tpu.dispatch_report)


def test_readme_production_flags_exist():
    """README names the TPU production PPO configuration flags — they must
    exist on PPOConfig with those names."""
    from mbt_gym_tpu.agents import ppo

    readme = _read("README.md")
    m = re.search(r"PPOConfig\(([^)]*)\)", readme)
    assert m, "README no longer shows the production PPOConfig flags"
    named = re.findall(r"(\w+)=", m.group(1))
    fields = set(ppo.PPOConfig.__dataclass_fields__)
    assert named and set(named) <= fields, (named, fields)


def test_dispatch_families_documented_in_module():
    """dispatch.py's family table must list exactly the families the code
    registers."""
    from mbt_gym_tpu import dispatch

    doc = dispatch.__doc__
    families = {fam for fam, _ in dispatch._FAMILIES.values()}
    for fam in families:
        assert fam in doc, fam
    assert families == {
        "as_episode", "cj_table", "fixed", "oe_episode", "mlp_rollout",
    }

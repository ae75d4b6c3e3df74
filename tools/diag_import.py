"""Diagnose imported EPMC/SEPMC checkpoint behavior (VERDICT item: imported
recurrent models score near zero — binary-search which obs field breaks them).

Levers:
  1. The imported prop_rms moving_mean/std ARE the training-time obs
     statistics. Rolling our env and z-scoring each prop component against
     them localizes any mis-ordered / mis-scaled field immediately.
  2. z_idx entropy over a rollout: a near-constant codebook index means the
     MLC (perception+LSTM) path is broken; varied z with bad reward points
     at the LLC/action path.

  python tools/diag_import.py --task epmc [--steps 300]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

MODELS = {
    "epmc": "/root/reference/data/models/environmental_level_hurdle.model",
    "sepmc": "/root/reference/data/models/strategic_level.model",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="epmc")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--zero_field", default="",
                    help="obs field to zero out (ablation)")
    args = ap.parse_args()

    from lifelike_tpu.compat import tleague_import
    from lifelike_tpu.envs import factory

    if args.task == "epmc":
        from lifelike_tpu.models.epmc import EPMCNet

        bundle = factory.create_playground_game(
            element_id=1, friction_range=(0.4, 1.0))
        net = EPMCNet()
        key = jax.random.PRNGKey(0)
        env_state, obs = bundle.reset(key)
        hs = net.initial_state(())
        params = net.init({"params": key, "z": key}, obs._asdict(), hs,
                          jnp.zeros(()))
        imported = tleague_import.import_epmc(MODELS["epmc"], params)
        rms = imported["params"]["prop_rms"]
        mean = np.asarray(rms["moving_mean"])
        std = np.asarray(rms["moving_std"])
        print(f"prop_rms dims: {mean.shape}; std range "
              f"[{std.min():.4f}, {std.max():.4f}]")

        fwd = jax.jit(lambda p, o, h, k: net.apply(
            p, o._asdict(), h, jnp.zeros(()), rngs={"z": k}))
        step = jax.jit(lambda s, a, k: bundle.step(s, a, k))

        props, zs, rews, amags = [], [], [], []
        for t in range(args.steps):
            key, k1, k2 = jax.random.split(key, 3)
            if args.zero_field:
                obs = obs._replace(**{
                    args.zero_field: jnp.zeros_like(
                        getattr(obs, args.zero_field))
                })
            out = fwd(imported, obs, hs, k1)
            hs = out.hs
            x = np.concatenate([np.asarray(obs.prop), np.asarray(obs.prop_a)])
            props.append(x)
            zs.append(int(out.z_idx))
            amags.append(float(np.abs(np.asarray(out.mean)).mean()))
            env_state, obs, r, done, info = step(
                env_state, {"A_Z": out.z_idx, "A_LLC": out.mean}, k2)
            rews.append(float(r))
            if bool(done):
                print(f"episode ended at t={t} "
                      f"(fall={bool(info.get('fall', 0))})")
                key, kr = jax.random.split(key)
                env_state, obs = bundle.reset(kr)
                hs = net.initial_state(())

        P = np.stack(props)  # (T, D)
        zscore = (P - mean) / (std + 1e-8)
        med = np.median(np.abs(zscore), axis=0)
        # group by the prop layout: 33 x 3 frames + 36 actions
        labels = []
        for f in range(3):
            labels += [f"jp{f}"] * 12 + [f"jv{f}"] * 12 + [f"lv{f}"] * 3 \
                + [f"av{f}"] * 3 + [f"eg{f}"] * 3
        labels += ["act"] * 36
        by = {}
        for lbl, m in zip(labels, med):
            by.setdefault(lbl, []).append(m)
        print("median |z-score| per obs group (training-stat mismatch > 3 "
              "is a red flag):")
        for lbl, ms in by.items():
            print(f"  {lbl}: mean {np.mean(ms):.2f} max {np.max(ms):.2f}")
        zs = np.asarray(zs)
        print(f"z_idx: {len(np.unique(zs))} unique / {len(zs)} steps; "
              f"top-5 {np.bincount(zs, minlength=256).argsort()[-5:][::-1]}")
        print(f"mean |a_llc| {np.mean(amags):.4f}; reward sum "
              f"{np.sum(rews):.3f} over {len(rews)} steps")
    else:
        from lifelike_tpu.models.sepmc import SEPMCNet

        bundle = factory.create_chase_tag_game(
            element_config={"rand_cube": False, "hurdle": False,
                            "hole": False})
        net = SEPMCNet()
        key = jax.random.PRNGKey(0)
        env_state, obs = bundle.reset(key)
        hs = net.initial_state((2,))
        flat = lambda o: {f: getattr(o, f) for f in o._fields}
        params = net.init({"params": key, "hlc": key, "z": key},
                          flat(obs), hs, jnp.zeros(2))
        imported = tleague_import.import_sepmc(MODELS["sepmc"], params)
        rms = imported["params"]["epmc"]["prop_rms"] \
            if "epmc" in imported["params"] else None
        fwd = jax.jit(lambda p, o, h, k1, k2: net.apply(
            p, o, h, jnp.zeros(2), rngs={"hlc": k1, "z": k2}))
        step = jax.jit(lambda s, a, k: bundle.step(s, a, k))
        zs, amags, rews = [], [], []
        for t in range(args.steps):
            key, k1, k2, k3 = jax.random.split(key, 4)
            out = fwd(imported, flat(obs), hs, k1, k2)
            hs = out.hs
            if hasattr(out, "z_idx"):
                zs.extend(np.asarray(out.z_idx).ravel().tolist())
            amags.append(float(np.abs(np.asarray(out.mean)).mean()))
            env_state, obs, r, done, info = step(
                env_state, {"A_LLC": out.mean}, k3)
            rews.append(np.asarray(r))
            if bool(done):
                print(f"episode ended at t={t} "
                      f"(caught={bool(info.get('caught', 0))})")
                key, kr = jax.random.split(key)
                env_state, obs = bundle.reset(kr)
                hs = net.initial_state((2,))
        if zs:
            zs = np.asarray(zs)
            print(f"z_idx: {len(np.unique(zs))} unique / {len(zs)} draws")
        print(f"mean |a_llc| {np.mean(amags):.4f}; per-robot reward sums "
              f"{np.sum(rews, axis=0)}")


if __name__ == "__main__":
    main()

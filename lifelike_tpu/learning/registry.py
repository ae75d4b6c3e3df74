"""Model pool + league manager: the host-side TLeague replacement.

The reference scales self-play through three external services — model_pool
(in-memory param store, pub/sub over ZMQ), league_mgr (population +
checkpointing + match-making), and per-process hyperparam managers
(SURVEY.md section 2.3). On TPU the rollouts are on-device, so these shrink
to a small host-side registry: parameter snapshots are tiny (<= 2 MB), the
opponent pool lives in host memory, and persistence is a directory of
pickled numpy pytrees (the analog of the reference's joblib .model files and
league checkpoints, example_pmc_train.sh:101-104).

Match-making implements both reference game managers:
  * SelfPlayGameMgr — always the latest model (example_pmc_train.sh:15)
  * PFSPGameMgr — prioritized fictitious self-play over frozen historical
    models, weighting opponents by (1 - win_rate)^p (example_sepmc_train.sh:14)
"""
import os
import pickle
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class ModelPool:
    """Keyed parameter store with optional directory persistence."""

    def __init__(self, root: Optional[str] = None):
        self._models: Dict[str, Any] = {}
        self._meta: Dict[str, dict] = {}
        self.root = root
        if root:
            os.makedirs(root, exist_ok=True)

    def push(self, key: str, params, meta: Optional[dict] = None, persist=False):
        self._models[key] = _to_numpy(params)
        self._meta[key] = dict(meta or {}, updated_at=time.time())
        if persist and self.root:
            self.save(key)

    def pull(self, key: str):
        if key not in self._models and self.root:
            self.load(key)
        return self._models[key]

    def keys(self) -> List[str]:
        return list(self._models.keys())

    def save(self, key: str):
        assert self.root, "ModelPool has no persistence root"
        with open(os.path.join(self.root, f"{key}.model"), "wb") as f:
            pickle.dump({"model": self._models[key], "meta": self._meta[key]}, f)

    def load(self, key: str):
        with open(os.path.join(self.root, f"{key}.model"), "rb") as f:
            blob = pickle.load(f)
        self._models[key] = blob["model"]
        self._meta[key] = blob.get("meta", {})
        return self._models[key]

    def load_file(self, key: str, path: str):
        """Seed a model from an explicit file (stage hand-off, reference
        --init_model_paths example_sepmc_train.sh:141)."""
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self._models[key] = blob["model"] if isinstance(blob, dict) else blob
        self._meta[key] = blob.get("meta", {}) if isinstance(blob, dict) else {}
        return self._models[key]


class TrainCheckpoint:
    """Full learner-state checkpoint (params + optimizer state + env state +
    update counter) for crash/preemption resume.

    The reference persists only the league population
    (example_pmc_train.sh:101-104, --save_interval_secs=85); the learner
    itself restarts cold. Here one file resumes the exact training step.
    Pickled numpy pytrees (structure classes ride the pickle); written to a
    temp file then atomically replaced, so a crash mid-save never corrupts
    the previous checkpoint."""

    def __init__(self, path: str):
        self.path = path

    def save(self, step: int, **trees):
        state = {
            "step": int(step),
            "trees": {k: _to_numpy(v) for k, v in trees.items()},
        }
        d = os.path.dirname(os.path.abspath(self.path))
        os.makedirs(d, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, self.path)

    def load(self) -> Optional[dict]:
        if not os.path.exists(self.path):
            return None
        with open(self.path, "rb") as f:
            return pickle.load(f)


class ShardedTrainCheckpoint:
    """Multi-process TrainCheckpoint: per-rank shard files + a commit marker.

    The reference's recoverable-training story saves the league from one
    process (example_pmc_train.sh:101-104); under SPMD the learner state is
    a mix of fully-replicated leaves (params, optimizer state) and
    process-sharded leaves (env state on the batch axis, replay windows on
    their slot axis), so one file cannot hold it. Scheme:

      path.r{rank}  every rank: for each leaf, its PROCESS-LOCAL block
                    (addressable shards concatenated along the sharded
                    axis) + the leaf's PartitionSpec and global shape.
                    Replicated leaves are stored by rank 0 only.
      path.step     rank 0, AFTER a cross-process barrier: the committed
                    step. A crash mid-save leaves rank files from a newer
                    step than the marker; load() rejects the mismatch and
                    resumes from nothing rather than mixed state.

    Restore re-places every leaf onto the SAME global mesh with
    jax.make_array_from_process_local_data, so load() hands back global
    jax.Arrays ready for the jitted step. Requires a filesystem shared by
    all ranks (the reference's league dir makes the same assumption).
    """

    def __init__(self, path: str, mesh):
        self.path = path
        self.mesh = mesh

    def _rank_path(self, rank):
        return f"{self.path}.r{rank}"

    @staticmethod
    def _local_block(x):
        """(local_numpy_or_None, spec, global_shape) for one global array."""
        import jax.sharding as jsh

        if not hasattr(x, "sharding") or not isinstance(
            getattr(x, "sharding", None), jsh.NamedSharding
        ):
            return np.asarray(x), None, np.shape(x)
        spec = tuple(x.sharding.spec)
        axis = next(
            (i for i, p in enumerate(spec) if p is not None), None
        )
        shards = list(x.addressable_shards)
        if axis is None:  # fully replicated
            if jax.process_index() != 0:
                return None, spec, tuple(x.shape)
            return np.asarray(shards[0].data), spec, tuple(x.shape)
        shards.sort(key=lambda s: s.index[axis].start or 0)
        seen, blocks = set(), []
        for s in shards:
            start = s.index[axis].start or 0
            if start not in seen:  # a block can replicate across local devices
                seen.add(start)
                blocks.append(np.asarray(s.data))
        return np.concatenate(blocks, axis=axis), spec, tuple(x.shape)

    def save(self, step: int, **trees):
        from jax.experimental import multihost_utils

        rank = jax.process_index()
        packed = {
            name: jax.tree.map(
                lambda x: self._local_block(x), tree, is_leaf=None
            )
            for name, tree in trees.items()
        }
        d = os.path.dirname(os.path.abspath(self.path))
        os.makedirs(d, exist_ok=True)
        tmp = self._rank_path(rank) + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump({"step": int(step), "trees": packed}, f)
        os.replace(tmp, self._rank_path(rank))
        multihost_utils.sync_global_devices(f"ckpt_save_{step}")
        if rank == 0:
            tmp = self.path + ".step.tmp"
            with open(tmp, "w") as f:
                f.write(str(int(step)))
            os.replace(tmp, self.path + ".step")

    def load(self) -> Optional[dict]:
        from jax.sharding import NamedSharding, PartitionSpec

        rank = jax.process_index()
        marker = self.path + ".step"
        if not (os.path.exists(marker) and os.path.exists(self._rank_path(rank))):
            return None
        with open(marker) as f:
            committed = int(f.read().strip())
        with open(self._rank_path(rank), "rb") as f:
            mine = pickle.load(f)
        if mine["step"] != committed:
            return None  # crashed mid-save: refuse mixed-step state
        if rank == 0:
            r0 = mine
        else:
            with open(self._rank_path(0), "rb") as f:
                r0 = pickle.load(f)
            if r0["step"] != committed:
                return None

        def place(blk, blk0):
            local, spec, gshape = blk
            if spec is None:
                return local
            if local is None:  # replicated leaf: rank 0's copy
                local = blk0[0]
            sh = NamedSharding(self.mesh, PartitionSpec(*spec))
            return jax.make_array_from_process_local_data(sh, local, gshape)

        trees = {
            name: jax.tree.map(
                place, mine["trees"][name], r0["trees"][name],
                is_leaf=lambda x: isinstance(x, tuple) and len(x) == 3
                and (x[0] is None or isinstance(x[0], np.ndarray)),
            )
            for name in mine["trees"]
        }
        return {"step": committed, "trees": trees}


class LeagueManager:
    """Population of frozen models + PFSP match-making + win statistics."""

    def __init__(
        self,
        pool: ModelPool,
        game_mgr_type: str = "self_play",  # {'self_play', 'pfsp'}
        pfsp_power: float = 1.0,
        checkpoint_dir: Optional[str] = None,
    ):
        self.pool = pool
        self.game_mgr_type = game_mgr_type
        self.pfsp_power = pfsp_power
        self.checkpoint_dir = checkpoint_dir
        self.population: List[str] = []
        # win counts of the learner vs each frozen opponent
        self.wins: Dict[str, int] = {}
        self.games: Dict[str, int] = {}

    def add_to_population(self, key: str):
        if key not in self.population:
            self.population.append(key)
            self.wins.setdefault(key, 0)
            self.games.setdefault(key, 0)

    def report_outcome(self, opponent_key: str, learner_won: bool):
        self.games[opponent_key] = self.games.get(opponent_key, 0) + 1
        self.wins[opponent_key] = self.wins.get(opponent_key, 0) + int(learner_won)

    def report_games(self, opponent_key: str, wins: int, games: int):
        """Batch outcome reporting: per-EPISODE game results (the reference
        counts actual game endings, not per-update return signs)."""
        self.games[opponent_key] = self.games.get(opponent_key, 0) + int(games)
        self.wins[opponent_key] = self.wins.get(opponent_key, 0) + int(wins)

    def win_rate(self, key: str) -> float:
        g = self.games.get(key, 0)
        return self.wins.get(key, 0) / g if g else 0.5

    def sample_opponent(self, rng: np.random.Generator) -> str:
        assert self.population, "empty population"
        if self.game_mgr_type == "self_play":
            return self.population[-1]
        # PFSP: weight by (1 - win_rate)^p — prefer opponents we lose to
        w = np.array(
            [(1.0 - self.win_rate(k)) ** self.pfsp_power for k in self.population]
        )
        w = w + 1e-6
        return str(rng.choice(self.population, p=w / w.sum()))

    def checkpoint(self):
        if not self.checkpoint_dir:
            return
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        state = {
            "population": self.population,
            "wins": self.wins,
            "games": self.games,
            "game_mgr_type": self.game_mgr_type,
        }
        with open(os.path.join(self.checkpoint_dir, "league.pkl"), "wb") as f:
            pickle.dump(state, f)
        for k in self.population:
            if self.pool.root:
                self.pool.save(k)

    def restore(self):
        path = os.path.join(self.checkpoint_dir or "", "league.pkl")
        if not os.path.exists(path):
            return False
        with open(path, "rb") as f:
            state = pickle.load(f)
        self.population = state["population"]
        self.wins = state["wins"]
        self.games = state["games"]
        return True

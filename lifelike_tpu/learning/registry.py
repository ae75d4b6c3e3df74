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

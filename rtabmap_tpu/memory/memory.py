"""Memory: signatures, STM→WM→LTM lifecycle, device slabs, transforms.

Capability parity: the reference's ``Memory``
(/root/reference/corelib/src/Memory.cpp — ``update`` :1018,
``createSignature`` :5025, rehearsal :4218, ``forget``/transfer :2317 with
``getRemovableSignatures`` :2625 (lowest weight, oldest, recent-WM ratio
immunized), retrieval ``reactivateSignatures`` :7037, pairwise
``computeTransform`` :3284 via shared words, ``getMetricConstraints``
:7141) — re-architected for TPU:

- Host: a light ``Signature`` record per node (ids, pose, links, weights)
  — the control plane.
- Device: fixed-capacity slabs aligned by WM slot — word lists (N,K),
  keypoint uv/3D (N,K,2/3) — the data plane that likelihood and
  loop-closure registration kernels consume directly.
- LTM: spilled signatures leave the slabs (word refs decremented) and
  survive as host/DB records; retrieval re-inserts them into free slots.

Loop-closure registration re-matches the signatures' stored descriptors
with NNDR (the reference's RegistrationVis feature-matching path invoked
from Memory::computeTransform, Memory.cpp:3284) — word-id correspondences
are too aliased by quantization for metrically-tight closures; the matmul
matcher makes full re-matching cheap on the MXU.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.core.frame import FrameFeatures
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.ops import ransac as R
from rtabmap_tpu.utils.params import Parameters
from rtabmap_tpu.vocab.dictionary import VWDictionary


# Link types (reference: Link.h:41-50)
LINK_NEIGHBOR = 0
LINK_GLOBAL_CLOSURE = 1
LINK_LOCAL_SPACE_CLOSURE = 2
LINK_LOCAL_TIME_CLOSURE = 3
LINK_USER_CLOSURE = 4
LINK_VIRTUAL_CLOSURE = 5
LINK_NEIGHBOR_MERGED = 6
LINK_POSE_PRIOR = 7
LINK_LANDMARK = 8
LINK_GRAVITY = 9


@dataclass
class Link:
    from_id: int
    to_id: int
    type: int
    transform: np.ndarray        # (3,4) T_from_to
    information: np.ndarray      # (6,6)


@dataclass
class Signature:
    id: int
    map_id: int
    stamp: float
    pose: np.ndarray             # (3,4) odometry pose
    weight: int = 0
    links: Dict[int, Link] = field(default_factory=dict)
    word_ids: Optional[np.ndarray] = None   # (K,) int32, -1 pad
    desc: Optional[np.ndarray] = None       # (K,D) ±1 int8 descriptors
    uv: Optional[np.ndarray] = None         # (K,2)
    pts3d: Optional[np.ndarray] = None      # (K,3) camera frame
    valid3d: Optional[np.ndarray] = None    # (K,)
    slot: int = -1               # WM device slot (-1 = not resident)
    in_ltm: bool = False
    label: str = ""
    scan: Optional[object] = None           # LaserScan (not persisted to WM slabs)
    user_data: Optional[bytes] = None       # opaque payload (reference:
                                            # SensorData::userData, the
                                            # WifiMapping example's channel)
    grid: Optional[object] = None           # LocalGrid occupancy cells
                                            # (reference: Data table grids)
    env_sensors: list = field(default_factory=list)  # [EnvSensor] readings
                                            # (reference: EnvSensor.h,
                                            # SensorData::envSensors)
    global_desc: Optional[np.ndarray] = None  # global descriptor vector
                                            # (reference: GlobalDescriptor
                                            # table, e.g. NetVLAD)
    gt_pose: Optional[np.ndarray] = None    # (3,4) ground-truth pose
                                            # (reference: Node.ground_truth_pose,
                                            # consumed by Reprocess/Report)
    velocity: Optional[np.ndarray] = None   # (6,) twist at this node
                                            # (reference: Node.velocity)
    gps: Optional[np.ndarray] = None        # (6,) stamp,long,lat,alt,error,
                                            # bearing (reference: Node.gps,
                                            # GPS.h)


from functools import partial


@partial(jax.jit, static_argnames=("iters", "min_inliers"))
def _registration_kernel(desc_a, valid_a, pts_a, desc_b, valid_b3d, uv_b,
                         pts_b, guess, cam_tuple, key,
                         iters: int, reproj_px, min_inliers: int,
                         nndr=jnp.float32(0.8)):
    """Jit-cached signature registration: mutual NNDR descriptor matching
    (MXU matmul) + PnP-RANSAC with Kabsch hypotheses. One compile per
    (K, iters)."""
    from rtabmap_tpu.ops import matching as M

    cam = C.CameraModel(*cam_tuple)
    m_ba = M.match_nndr(desc_b, jnp.any(desc_b != 0, -1), desc_a, valid_a, nndr=nndr)
    m_ab = M.match_nndr(desc_a, valid_a, desc_b, jnp.any(desc_b != 0, -1), nndr=nndr)
    mutual = M.cross_check(m_ba, m_ab)
    mm = m_ba._replace(valid=mutual)
    return R.ransac_pnp(
        pts_a[mm.idx], uv_b, mm.valid, cam, key, iters=iters,
        reproj_px=reproj_px, min_inliers=min_inliers, guess=guess,
        pts3d_query=jnp.where(valid_b3d[:, None], pts_b, 0.0),
    ), mm


@jax.jit
def _slab_set(node_words, node_uv, node_pts, node_valid, slot, words, uv, pts, valid):
    node_words = node_words.at[slot].set(words)
    node_uv = node_uv.at[slot].set(uv)
    node_pts = node_pts.at[slot].set(pts)
    node_valid = node_valid.at[slot].set(valid)
    return node_words, node_uv, node_pts, node_valid


@jax.jit
def _slab_clear(node_words, node_valid, slot):
    return node_words.at[slot].set(-1), node_valid.at[slot].set(False)


@jax.jit
def _nw_add(word_nw, words):
    # unique words only: collapse duplicates via set-to-1 scatter then add
    W = word_nw.shape[0]
    w = jnp.where(words >= 0, words, W)
    uniq = jnp.zeros((W + 1,)).at[w].set(1.0, mode="drop")
    return word_nw + uniq[:W]


@jax.jit
def _nw_sub(word_nw, words):
    W = word_nw.shape[0]
    w = jnp.where(words >= 0, words, W)
    uniq = jnp.zeros((W + 1,)).at[w].set(1.0, mode="drop")
    return jnp.maximum(word_nw - uniq[:W], 0.0)


class Memory:
    """STM/WM/LTM signature store + device slabs."""

    def __init__(self, params: Optional[Parameters] = None,
                 node_capacity: int = 1024, words_per_frame: int = 512,
                 vocab: Optional[VWDictionary] = None, db=None):
        p = params or Parameters()
        self.params = p
        self.stm_size = int(p["Mem/STMSize"])
        self.rehearsal_sim = float(p["Mem/RehearsalSimilarity"])
        self.recent_wm_ratio = float(p["Mem/RecentWmRatio"])
        self.incremental = bool(p["Mem/IncrementalMemory"])
        self.node_capacity = node_capacity
        self.K = words_per_frame
        self.vocab = vocab or VWDictionary(
            capacity=int(p["Tpu/VocabularyCapacity"]),
            nndr=float(p["Kp/NndrRatio"]),
            incremental=self.incremental,
        )
        self.db = db

        # host records
        self.signatures: Dict[int, Signature] = {}
        self.stm: List[int] = []
        self.wm: List[int] = []      # insertion-ordered (oldest first)
        self._next_id = 1
        self._map_id = 0

        # device slabs (WM+STM resident set)
        N, K = node_capacity, words_per_frame
        self.node_words = jnp.full((N, K), -1, jnp.int32)
        self.node_uv = jnp.zeros((N, K, 2), jnp.float32)
        self.node_pts = jnp.zeros((N, K, 3), jnp.float32)
        self.node_valid = jnp.zeros((N,), bool)
        self.word_nw = jnp.zeros((self.vocab.capacity,), jnp.float32)
        self._free_slots = list(range(N - 1, -1, -1))
        self._slot_to_id = np.full((N,), -1, np.int64)

    # ------------------------------------------------------------------ props
    @property
    def n_resident(self) -> int:
        return len(self.stm) + len(self.wm)

    @property
    def map_id(self) -> int:
        return self._map_id

    def new_map(self):
        self._map_id += 1

    def get(self, sid: int) -> Optional[Signature]:
        return self.signatures.get(sid)

    # -------------------------------------------------------------- creation
    def create_signature(self, frame: FrameFeatures, pose, stamp: float = 0.0,
                         weight: int = 0) -> Signature:
        """Quantize features into words + allocate a WM slot.

        (reference: Memory::createSignature Memory.cpp:5025.)
        """
        word_ids, _ = self.vocab.quantize(frame.desc, frame.valid)
        sid = self._next_id
        self._next_id += 1
        sig = Signature(
            id=sid, map_id=self._map_id, stamp=stamp,
            pose=np.asarray(pose, np.float32), weight=weight,
            word_ids=word_ids,
            desc=np.asarray(frame.desc, np.int8),
            uv=np.asarray(frame.uv, np.float32),
            pts3d=np.asarray(frame.pts3d, np.float32),
            valid3d=np.asarray(frame.valid3d & frame.valid),
        )
        self.signatures[sid] = sig
        self._insert_slab(sig)
        return sig

    def _insert_slab(self, sig: Signature):
        if not self._free_slots:
            raise RuntimeError("WM slab capacity exhausted — transfer first")
        slot = self._free_slots.pop()
        sig.slot = slot
        self._slot_to_id[slot] = sig.id
        self.node_words, self.node_uv, self.node_pts, self.node_valid = _slab_set(
            self.node_words, self.node_uv, self.node_pts, self.node_valid,
            slot, jnp.asarray(sig.word_ids), jnp.asarray(sig.uv),
            jnp.asarray(sig.pts3d), True,
        )
        self.word_nw = _nw_add(self.word_nw, jnp.asarray(sig.word_ids))

    def _remove_slab(self, sig: Signature):
        if sig.slot < 0:
            return
        self.node_words, self.node_valid = _slab_clear(
            self.node_words, self.node_valid, sig.slot
        )
        self.word_nw = _nw_sub(self.word_nw, jnp.asarray(sig.word_ids))
        self._slot_to_id[sig.slot] = -1
        self._free_slots.append(sig.slot)
        sig.slot = -1

    # ----------------------------------------------------------------- links
    def add_link(self, link: Link):
        a = self.signatures.get(link.from_id)
        b = self.signatures.get(link.to_id)
        if a is not None:
            a.links[link.to_id] = link
        if b is not None:
            inv = Link(link.to_id, link.from_id, link.type,
                       np.asarray(T.inverse(jnp.asarray(link.transform))),
                       link.information)
            b.links[link.from_id] = inv

    def remove_link(self, from_id: int, to_id: int):
        if from_id in self.signatures:
            self.signatures[from_id].links.pop(to_id, None)
        if to_id in self.signatures:
            self.signatures[to_id].links.pop(from_id, None)
        # purge the persisted rows too — re-saving a signature upserts its
        # remaining links but never deletes, so a removed closure would
        # resurrect on resume
        if self.db is not None:
            self.db.delete_link(from_id, to_id)

    def remove_virtual_links(self, node_id: int):
        """Drop all kVirtualClosure links touching a node (reference:
        Memory::removeVirtualLinks, used by the planner's goal tracking)."""
        s = self.signatures.get(node_id)
        if s is None:
            return
        for other in [k for k, lk in s.links.items()
                      if lk.type == LINK_VIRTUAL_CLOSURE]:
            self.remove_link(node_id, other)

    # -------------------------------------------------------------- lifecycle
    def add_to_stm(self, sig: Signature, neighbor_link: Optional[Link] = None):
        """(reference: Memory::addSignatureToStm Memory.cpp:1142.)

        In localization mode (Mem/IncrementalMemory=false) signatures
        leaving the STM are DELETED instead of promoted to WM — the loaded
        map stays frozen (reference non-incremental semantics)."""
        if neighbor_link is not None:
            self.add_link(neighbor_link)
        self.stm.append(sig.id)
        while len(self.stm) > self.stm_size:
            moved = self.stm.pop(0)
            if self.incremental:
                self.wm.append(moved)
            else:
                self.delete_signature(moved)

    def delete_signature(self, sid: int):
        """Drop a signature entirely (slab + links + record)."""
        sig = self.signatures.get(sid)
        if sig is None:
            return
        self._remove_slab(sig)
        for j in list(sig.links):
            self.remove_link(sid, j)
        del self.signatures[sid]

    def remove_node(self, sid: int):
        """delete_signature + STM/WM bookkeeping (reference:
        Memory::deleteLocation, used by Rtabmap::deleteLastLocation)."""
        self.delete_signature(sid)
        if sid in self.stm:
            self.stm.remove(sid)
        if sid in self.wm:
            self.wm.remove(sid)

    def clear(self):
        """Drop all resident state and restart sessions (reference:
        Memory::init(clear) path behind Rtabmap::resetMemory). The
        database connection (if any) is kept; new nodes get fresh ids in
        a new map session."""
        for sid in list(self.signatures):
            self.remove_node(sid)
        self.stm.clear()
        self.wm.clear()
        self._map_id += 1

    def rehearsal(self, sig: Signature) -> bool:
        """Compare to the previous STM signature; on similarity >= threshold
        transfer weight (reference: Memory::rehearsal Memory.cpp:4218,
        Signature::compareTo = shared words / max word count)."""
        if len(self.stm) < 1:
            return False
        prev = self.signatures[self.stm[-1]]
        sim = self.similarity(sig, prev)
        self.last_rehearsal_sim = sim          # Statistics: Memory/Rehearsal sim/
        self.last_rehearsal_id = prev.id
        if sim >= self.rehearsal_sim:
            sig.weight = prev.weight + 1
            return True
        return False

    @staticmethod
    def similarity(a: Signature, b: Signature) -> float:
        wa = set(int(w) for w in a.word_ids if w >= 0)
        wb = set(int(w) for w in b.word_ids if w >= 0)
        if not wa or not wb:
            return 0.0
        return len(wa & wb) / float(max(len(wa), len(wb)))

    # --------------------------------------------------------------- transfer
    def removable_ids(self, count: int, immune: Optional[set] = None) -> List[int]:
        """Lowest-weight-then-oldest WM signatures, with the most recent
        ``recent_wm_ratio`` of WM and STM immunized
        (reference: Memory::getRemovableSignatures Memory.cpp:2625)."""
        immune = set(immune or ())
        immune.update(self.stm)
        n_recent = int(len(self.wm) * self.recent_wm_ratio)
        if n_recent > 0:
            immune.update(self.wm[-n_recent:])
        cands = [self.signatures[i] for i in self.wm if i not in immune]
        cands.sort(key=lambda s: (s.weight, s.id))
        return [s.id for s in cands[:count]]

    def move_to_ltm(self, sid: int):
        """Spill: remove from WM/slabs, persist to DB if attached
        (reference: Memory::moveToTrash Memory.cpp:2759 + async DB write)."""
        sig = self.signatures[sid]
        self._remove_slab(sig)
        if sid in self.wm:
            self.wm.remove(sid)
        sig.in_ltm = True
        if self.db is not None:
            self.db.save_signature(sig)

    def retrieve(self, ids: List[int]) -> List[int]:
        """Page LTM signatures back into WM slots
        (reference: Memory::reactivateSignatures Memory.cpp:7037)."""
        out = []
        for sid in ids:
            sig = self.signatures.get(sid)
            if sig is None and self.db is not None:
                sig = self.db.load_signature(sid)
                if sig is not None:
                    self.signatures[sid] = sig
            if sig is None or not sig.in_ltm:
                continue
            if not self._free_slots:
                break
            sig.in_ltm = False
            self._insert_slab(sig)
            self.wm.append(sid)
            out.append(sid)
        return out

    # --------------------------------------------------- pairwise registration
    def compute_transform(self, from_id: int, to_id: int, cam: C.CameraModel,
                          key, guess=None, min_inliers: int = 20,
                          reproj_px: float = 4.0, iters: int = 256
                          ) -> Tuple[Optional[np.ndarray], np.ndarray, int]:
        """Signature registration A->B: stored-descriptor mutual NNDR
        matching + PnP-RANSAC
        (reference: Memory::computeTransform Memory.cpp:3284 ->
        RegistrationVis::computeTransformationImpl).

        Returns (T_ab or None, covariance, inliers).
        """
        a = self.signatures[from_id]
        b = self.signatures[to_id]
        guess_arr = jnp.asarray(guess) if guess is not None else T.identity()
        cam_tuple = (cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
                     cam.dist, cam.local_transform)
        res, _ = _registration_kernel(
            jnp.asarray(a.desc), jnp.asarray(a.valid3d), jnp.asarray(a.pts3d),
            jnp.asarray(b.desc), jnp.asarray(b.valid3d), jnp.asarray(b.uv),
            jnp.asarray(b.pts3d), guess_arr, cam_tuple, key,
            iters, jnp.float32(reproj_px), min_inliers,
        )
        if not bool(res.success):
            return None, np.eye(6) * 9999.0, int(res.num_inliers)
        return (np.asarray(res.transform), np.asarray(res.covariance),
                int(res.num_inliers))

    # ------------------------------------------------------------ constraints
    def get_constraints(self, session_only: bool = True):
        """Poses + links of resident signatures for the optimizer
        (reference: Memory::getMetricConstraints Memory.cpp:7141)."""
        ids = [i for i in (self.wm + self.stm)]
        if session_only:
            ids = [i for i in ids if self.signatures[i].map_id == self._map_id]
        idset = set(ids)
        poses = {i: self.signatures[i].pose for i in ids}
        links = []
        seen = set()
        for i in ids:
            for j, lk in self.signatures[i].links.items():
                if j in idset and (j, i) not in seen:
                    seen.add((i, j))
                    links.append(lk)
                elif j < 0 and lk.type == LINK_LANDMARK:
                    # landmark constraints (negative ids, reference
                    # convention) — the optimizer adds landmark nodes
                    links.append(lk)
        return poses, links


def _shared_word_rows(words_a: np.ndarray, words_b: np.ndarray):
    """Indices (ia, ib) of UNIQUE words present in both signatures
    (duplicate words are ambiguous and dropped, like the reference's
    unique-word correspondence rule in RegistrationVis)."""

    def unique_rows(w):
        vals, idx, counts = np.unique(w, return_index=True, return_counts=True)
        keep = (vals >= 0) & (counts == 1)
        return vals[keep], idx[keep]

    va, ia = unique_rows(words_a)
    vb, ib = unique_rows(words_b)
    common, ca, cb = np.intersect1d(va, vb, return_indices=True)
    return ia[ca].astype(np.int32), ib[cb].astype(np.int32)

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

import time as _time

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.core.frame import FrameFeatures
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.ops import ransac as R
from rtabmap_tpu.utils.logging import get_logger
from rtabmap_tpu.utils.params import Parameters
from rtabmap_tpu.vocab.dictionary import VWDictionary

log = get_logger("memory")


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
    pending_word_ids: Optional[object] = None  # device word ids while a
                                 # deferred create is in flight
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
    image: Optional[np.ndarray] = None      # (H,W) grayscale kept ONLY when
                                            # Vis/CorType=1 (optical-flow
                                            # correspondences need pixels;
                                            # reference: imageRaw in
                                            # RegistrationVis flow path)
    descf: Optional[np.ndarray] = None      # (K,256) float descriptors kept
                                            # ONLY when Vis/CorNNType=6
                                            # (SuperGlue matching needs the
                                            # pre-binarization SuperPoint
                                            # descriptors; reference:
                                            # PyMatcher/rtabmap_superglue.py)


from functools import partial


class IdList(list):
    """Insertion-ordered id list with O(1) membership — the WM/STM
    containers are scanned with ``in`` on hot per-tick paths (proximity
    candidate filtering, STM checks); a plain list makes those O(WM). Assumes
    unique ids (the reference's WM/STM sets are keyed maps)."""

    def __init__(self, it=()):
        super().__init__(it)
        self._set = set(self)

    def append(self, x):
        super().append(x)
        self._set.add(x)

    def extend(self, it):
        it = list(it)
        super().extend(it)
        self._set.update(it)

    def remove(self, x):
        super().remove(x)
        self._set.discard(x)

    def pop(self, idx=-1):
        v = super().pop(idx)
        self._set.discard(v)
        return v

    def clear(self):
        super().clear()
        self._set.clear()

    def __contains__(self, x):
        return x in self._set


@partial(jax.jit, static_argnames=("iters", "min_inliers", "use_window",
                                   "use_gms"))
def _registration_kernel(desc_a, valid_a, pts_a, uv_a, desc_b, valid_b3d,
                         uv_b, pts_b, guess, cam_tuple, key,
                         iters: int, reproj_px, min_inliers: int,
                         nndr=jnp.float32(0.8),
                         window_px=jnp.float32(0.0),
                         use_window: bool = False, use_gms: bool = False):
    """Jit-cached signature registration: mutual NNDR descriptor matching
    (MXU matmul) + PnP-RANSAC with Kabsch hypotheses. One compile per
    (K, iters, window/gms mode).

    use_window: restrict B->A candidates to a Vis/CorGuessWinSize pixel
    window around A's 3D points projected into B via the guess (reference:
    RegistrationVis.cpp:1018-1120 guess-projected window search) — the
    low-overlap / repetitive-texture rescue mode.
    use_gms: Grid Motion Statistics re-ranking of the mutual matches
    (reference: Vis/CorNNType=7 via gms_matcher.h)."""
    from rtabmap_tpu.ops import matching as M

    cam = C.CameraModel(*cam_tuple)
    valid_bd = jnp.any(desc_b != 0, -1)
    if use_window:
        # project A's points into B's camera through the guess:
        # x_B = inv(guess) . x_A  (guess = B-in-A, ransac_pnp convention)
        xb = T.apply(T.inverse(guess)[None], pts_a[None])[0]
        uv_proj, z_proj = C.project(xb, cam)
        # points behind the camera never match
        valid_a = valid_a & (z_proj > 0)
        m_ba = M.match_nndr(desc_b, valid_bd, desc_a, valid_a, nndr=nndr,
                            guess_uv=uv_b, uv_b=uv_proj, window=window_px)
        m_ab = M.match_nndr(desc_a, valid_a, desc_b, valid_bd, nndr=nndr,
                            guess_uv=uv_proj, uv_b=uv_b, window=window_px)
    else:
        m_ba, m_ab = M.match_nndr_bidir(desc_b, valid_bd, desc_a, valid_a,
                                        nndr=nndr)
    mutual = M.cross_check(m_ba, m_ab)
    if use_gms:
        H, W = cam_tuple[5], cam_tuple[4]
        gms_ok = M.gms_filter(uv_b, uv_a[m_ba.idx], mutual, (H, W), (H, W))
        # GMS needs statistical support; below ~30 matches keep NNDR's view
        mutual = jnp.where(jnp.sum(mutual) >= 30, mutual & gms_ok, mutual)
    mm = m_ba._replace(valid=mutual)
    res = R.ransac_pnp(
        pts_a[mm.idx], uv_b, mm.valid, cam, key, iters=iters,
        reproj_px=reproj_px, min_inliers=min_inliers, guess=guess,
        pts3d_query=jnp.where(valid_b3d[:, None], pts_b, 0.0),
    )
    # inlier statistics (reference: RegistrationInfo inliersMeanDistance /
    # inliersDistribution consumed at Rtabmap.cpp:2893-2906): mean 3D range
    # of the inlier points and their normalized image spread
    w = res.inliers
    n = jnp.maximum(jnp.sum(w), 1)
    sel = pts_a[mm.idx]
    mean_dist = jnp.sum(jnp.linalg.norm(sel, axis=-1) * w) / n
    c = jnp.sum(uv_b * w[:, None], axis=0) / n
    diag = jnp.sqrt(jnp.float32(cam_tuple[4]) ** 2
                    + jnp.float32(cam_tuple[5]) ** 2)
    spread = jnp.sqrt(jnp.sum(jnp.sum((uv_b - c) ** 2, -1) * w) / n) / diag
    return res, mm, (mean_dist, spread)


@partial(jax.jit, static_argnames=("iters", "min_inliers", "use_window",
                                   "use_gms"))
def _registration_kernel_batch(desc_a, valid_a, pts_a, uv_a, desc_b,
                               valid_b3d, uv_b, pts_b, guesses, cam_tuple,
                               keys, iters: int, reproj_px,
                               min_inliers: int, nndr, window_px,
                               use_window: bool = False,
                               use_gms: bool = False):
    """P independent A_i->B registrations as ONE device dispatch (vmap
    over the candidate axis). The TPU-native form of the reference's
    serial per-path registrations in proximity detection
    (Rtabmap.cpp:2828-2920): each extra serial call costs a kernel
    launch + a host round trip; batched, the P match matmuls tile the
    MXU together and all results come back in one fetch."""

    def one(da, va, pa, ua, g, k):
        return _registration_kernel(
            da, va, pa, ua, desc_b, valid_b3d, uv_b, pts_b, g, cam_tuple,
            k, iters, reproj_px, min_inliers, nndr=nndr,
            window_px=window_px, use_window=use_window, use_gms=use_gms)

    return jax.vmap(one)(desc_a, valid_a, pts_a, uv_a, guesses, keys)


@jax.jit
def _slab_set(node_words, node_uv, node_pts, node_valid, word_nw,
              slot, words, uv, pts, valid):
    """Fused insert: slab rows + word reference counts in ONE dispatch
    (each extra dispatch costs a full RTT on tunneled/remote chips)."""
    node_words = node_words.at[slot].set(words)
    node_uv = node_uv.at[slot].set(uv)
    node_pts = node_pts.at[slot].set(pts)
    node_valid = node_valid.at[slot].set(valid)
    return node_words, node_uv, node_pts, node_valid, _nw_add(word_nw, words)


@jax.jit
def _slab_clear(node_words, node_valid, word_nw, slot, words):
    return (node_words.at[slot].set(-1), node_valid.at[slot].set(False),
            _nw_sub(word_nw, words))


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
                 vocab: Optional[VWDictionary] = None, db=None,
                 mesh=None, shard_axis: str = "shard"):
        p = params or Parameters()
        # --- multi-chip mode: node + vocabulary slabs live partitioned
        # over the mesh axis (jax.sharding.NamedSharding); every jitted
        # kernel over them (likelihood, Bayes, slab scatter, retrieval)
        # is then partitioned by XLA with ICI collectives inserted
        # automatically — the WM memory ceiling and the appearance-stage
        # FLOPs scale with chips (SURVEY.md §5.7: the reference's
        # single-process WM cache over SQLite has no analogue of this).
        self.mesh, self.shard_axis = mesh, shard_axis
        if mesh is not None:
            n_sh = mesh.shape[shard_axis]
            node_capacity = ((node_capacity + n_sh - 1) // n_sh) * n_sh
        self.params = p
        self.stm_size = int(p["Mem/STMSize"])
        self.rehearsal_sim = float(p["Mem/RehearsalSimilarity"])
        self.recent_wm_ratio = float(p["Mem/RecentWmRatio"])
        self.incremental = bool(p["Mem/IncrementalMemory"])
        # rehearsal merge knobs (reference: Memory.cpp:4274 rehearsalMerge;
        # max distance/angle default to RGBD/Linear|AngularUpdate,
        # Memory.cpp:111-112)
        self.rehearsal_id_updated_to_new = bool(
            p["Mem/RehearsalIdUpdatedToNewOne"])
        self.rehearsal_weight_ignored_while_moving = bool(
            p["Mem/RehearsalWeightIgnoredWhileMoving"])
        self.rehearsal_max_distance = float(p["RGBD/LinearUpdate"])
        self.rehearsal_max_angle = float(p["RGBD/AngularUpdate"])
        self.reduce_graph = bool(p["Mem/ReduceGraph"])
        # correspondence knobs (reference: RegistrationVis Vis/Cor*)
        self.cor_type = int(p["Vis/CorType"])          # 0 features, 1 flow
        self.cor_nndr = float(p["Vis/CorNNDR"])
        self.cor_nn_type = int(p["Vis/CorNNType"])     # 7 = GMS re-ranking
        self.guess_win_size = float(p["Vis/CorGuessWinSize"])
        self.flow_win_size = int(p["Vis/CorFlowWinSize"])
        self.flow_iterations = int(p["Vis/CorFlowIterations"])
        self.flow_max_level = int(p["Vis/CorFlowMaxLevel"])
        # likelihood strategy + bad-signature gating (reference:
        # Kp/TfIdfLikelihoodUsed, Kp/BadSignRatio, Mem/BadSignaturesIgnored)
        self.tfidf_likelihood_used = bool(p["Kp/TfIdfLikelihoodUsed"])
        self.bad_sign_ratio = float(p["Kp/BadSignRatio"])
        self.bad_signatures_ignored = bool(p["Mem/BadSignaturesIgnored"])
        self.kp_max_features = int(p["Kp/MaxFeatures"])
        # Vis/CorNNType=6: attentional matcher (the reference's PyMatcher
        # slot, python/PyMatcher.cpp). Two backends: official-architecture
        # SuperGlue params (attach via set_superglue(), converted
        # checkpoint) or the in-repo trained SuperGlueMatcher
        # (models/superglue.py), auto-loaded on first use when
        # PyMatcher/Path is empty — so Vis/CorNNType=6 works out of the
        # box with the bundled weights.
        self.superglue_params = None
        self.py_matcher = None
        self.pymatcher_path = str(p["PyMatcher/Path"] or "")
        self.pymatcher_threshold = float(p["PyMatcher/Threshold"])
        self.pymatcher_iters = int(p["PyMatcher/Iterations"])
        self.node_capacity = node_capacity
        self.K = words_per_frame
        self.vocab = vocab or VWDictionary(
            capacity=int(p["Tpu/VocabularyCapacity"]),
            nndr=float(p["Kp/NndrRatio"]),
            incremental=self.incremental,
        )
        if mesh is not None and self.vocab.mesh is None:
            self.vocab.shard(mesh, shard_axis)
        self.db = db

        # host records
        self._pending_create = None  # in-flight deferred create handles
        self._current_frame_dev = None  # latest frame's device arrays
        self._current_frame_id = -1     # (for B-side registration reuse)
        self.signatures: Dict[int, Signature] = {}
        self.stm: List[int] = IdList()
        self.wm: List[int] = IdList()  # insertion-ordered (oldest first)
        self._next_id = 1
        self._map_id = 0

        # device slabs (WM+STM resident set)
        N, K = node_capacity, words_per_frame
        self.node_words = jnp.full((N, K), -1, jnp.int32)
        self.node_uv = jnp.zeros((N, K, 2), jnp.float32)
        self.node_pts = jnp.zeros((N, K, 3), jnp.float32)
        self.node_valid = jnp.zeros((N,), bool)
        self.word_nw = jnp.zeros((self.vocab.capacity,), jnp.float32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ax = shard_axis
            self.node_words = jax.device_put(
                self.node_words, NamedSharding(mesh, P(ax, None)))
            self.node_uv = jax.device_put(
                self.node_uv, NamedSharding(mesh, P(ax, None, None)))
            self.node_pts = jax.device_put(
                self.node_pts, NamedSharding(mesh, P(ax, None, None)))
            self.node_valid = jax.device_put(
                self.node_valid, NamedSharding(mesh, P(ax)))
            self.word_nw = jax.device_put(
                self.word_nw, NamedSharding(mesh, P(ax)))
        self._free_slots = list(range(N - 1, -1, -1))
        self._slot_to_id = np.full((N,), -1, np.int64)
        # host mirrors of the resident masks (slot-aligned): the engine's
        # per-tick appearance prep reads these instead of fetching
        # node_valid from device / scanning WM in Python (O(WM) at 16k+)
        self.host_valid = np.zeros((N,), bool)
        self.host_wm = np.zeros((N,), bool)
        self.n_inter_wm = 0   # weight<0 (intermediate) nodes in WM
        # incremental Bayes neighbor table (created on first use by the
        # engine; kept in sync by link/slab mutations below)
        self._nbr_table = None

    # ------------------------------------------------- Bayes neighbor table
    _NBR_TYPES = (LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED)

    def ensure_neighbor_table(self, depth: int, max_neighbors: int):
        """Incrementally-maintained BFS table over resident neighbor links
        (replaces per-tick full rebuilds — see
        bayes.filter.IncrementalNeighborTable)."""
        from rtabmap_tpu.bayes.filter import IncrementalNeighborTable

        t = self._nbr_table
        if (t is None or t.depth != depth
                or t.max_neighbors != max_neighbors):
            t = IncrementalNeighborTable(self.node_capacity, depth,
                                         max_neighbors)
            # seed from the current resident graph
            for sid in (self.wm + self.stm):
                s = self.signatures.get(sid)
                if s is None or s.slot < 0:
                    continue
                t.add_node(s.slot)
            for sid in (self.wm + self.stm):
                s = self.signatures.get(sid)
                if s is None or s.slot < 0:
                    continue
                for j, lk in s.links.items():
                    o = self.signatures.get(j)
                    if (o is not None and o.slot >= 0
                            and lk.type in self._NBR_TYPES):
                        t.add_edge(s.slot, o.slot)
            self._nbr_table = t
        return t

    def _nbr_edge(self, link: Link, add: bool):
        if self._nbr_table is None or link.type not in self._NBR_TYPES:
            return
        a = self.signatures.get(link.from_id)
        b = self.signatures.get(link.to_id)
        if a is None or b is None or a.slot < 0 or b.slot < 0:
            return
        if add:
            self._nbr_table.add_edge(a.slot, b.slot)
        else:
            self._nbr_table.remove_edge(a.slot, b.slot)

    def set_superglue(self, params) -> None:
        """Attach official SuperGlue weights (from
        models.convert.convert_superglue) for Vis/CorNNType=6 matching."""
        self.superglue_params = params

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
                         weight: int = 0,
                         deferred: bool = False) -> Signature:
        """Quantize features into words + allocate a WM slot.

        (reference: Memory::createSignature Memory.cpp:5025.)

        ``deferred=True`` (the engine's async tick) dispatches
        quantization/insertion entirely on device and starts async
        device->host copies but does NOT block: the Signature's host
        feature arrays (word_ids/desc/uv/pts3d/valid3d) stay None and
        ``pending_word_ids`` holds the device word ids (for downstream
        dispatches) until :meth:`finalize_signature` completes the ONE
        blocking fetch. Through the ~26 ms-RTT TPU tunnel this removes
        two sequential round trips from every tick.
        """
        import jax

        _t_q = _time.perf_counter()
        wid_dev, _new_dev, n_new_dev = self.vocab.quantize_async(
            frame.desc, frame.valid)
        self.last_create_timings = {
            "TimingMem/Add new words/ms":
                (_time.perf_counter() - _t_q) * 1000.0}
        sid = self._next_id
        self._next_id += 1
        ok3d_dev = frame.valid3d & frame.valid
        sig = Signature(
            id=sid, map_id=self._map_id, stamp=stamp,
            pose=np.asarray(pose, np.float32), weight=weight,
            word_ids=None, desc=None, uv=None, pts3d=None, valid3d=None,
        )
        sig.pending_word_ids = wid_dev
        self._current_frame_dev = (frame.desc, frame.uv, frame.pts3d,
                                   ok3d_dev)
        self._current_frame_id = sid
        self.signatures[sid] = sig
        # reuse the frame's device-resident arrays for the slab write —
        # re-uploading host copies would add transfers
        self._insert_slab(sig, uv_dev=frame.uv, pts_dev=frame.pts3d,
                          words_dev=wid_dev)
        handles = (wid_dev, n_new_dev, frame.desc, frame.uv, frame.pts3d,
                   ok3d_dev)
        for a in handles:
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        self._pending_create = (sig, handles)
        if not deferred:
            self.finalize_signature()
        return sig

    def finalize_signature(self) -> None:
        """Complete the deferred create: ONE blocking fetch fills the host
        Signature arrays and catches the vocabulary counter up."""
        if self._pending_create is None:
            return
        import jax

        (sig, (wid_dev, n_new_dev, desc_dev, uv_dev, pts_dev, ok3d_dev)), \
            self._pending_create = self._pending_create, None
        wid, n_new, desc_h, uv_h, pts_h, ok3d_h = jax.device_get(
            (wid_dev, n_new_dev, desc_dev, uv_dev, pts_dev, ok3d_dev))
        self.vocab.commit_new_words(int(n_new))
        sig.word_ids = wid.astype(np.int32)
        sig.desc = desc_h.astype(np.int8)
        sig.uv = uv_h.astype(np.float32)
        sig.pts3d = pts_h.astype(np.float32)
        sig.valid3d = ok3d_h
        sig.pending_word_ids = None

    def _insert_slab(self, sig: Signature, uv_dev=None, pts_dev=None,
                     words_dev=None):
        if not self._free_slots:
            raise RuntimeError("WM slab capacity exhausted — transfer first")
        slot = self._free_slots.pop()
        sig.slot = slot
        self._slot_to_id[slot] = sig.id
        (self.node_words, self.node_uv, self.node_pts, self.node_valid,
         self.word_nw) = _slab_set(
            self.node_words, self.node_uv, self.node_pts, self.node_valid,
            self.word_nw, slot,
            jnp.asarray(sig.word_ids) if words_dev is None else words_dev,
            jnp.asarray(sig.uv) if uv_dev is None else uv_dev,
            jnp.asarray(sig.pts3d) if pts_dev is None else pts_dev, True,
        )
        self.host_valid[slot] = True
        if sig.id in self.wm:
            self.host_wm[slot] = True
        if self._nbr_table is not None:
            self._nbr_table.add_node(slot)
            for j, lk in sig.links.items():
                o = self.signatures.get(j)
                if (o is not None and o.slot >= 0
                        and lk.type in self._NBR_TYPES):
                    self._nbr_table.add_edge(slot, o.slot)

    def _remove_slab(self, sig: Signature):
        if sig.slot < 0:
            return
        if self._nbr_table is not None:
            self._nbr_table.remove_node(sig.slot)
        self.node_words, self.node_valid, self.word_nw = _slab_clear(
            self.node_words, self.node_valid, self.word_nw, sig.slot,
            jnp.asarray(sig.word_ids),
        )
        self.host_valid[sig.slot] = False
        self.host_wm[sig.slot] = False
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
            # host numpy inverse: a device dispatch per link dominated
            # engine population/tick time through the TPU tunnel
            inv = Link(link.to_id, link.from_id, link.type,
                       T.np_inverse(np.asarray(link.transform,
                                               np.float32)),
                       link.information)
            b.links[link.from_id] = inv
        self._nbr_edge(link, add=True)

    def remove_link(self, from_id: int, to_id: int):
        lk = (self.signatures[from_id].links.get(to_id)
              if from_id in self.signatures else None)
        if lk is not None:
            self._nbr_edge(lk, add=False)
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
                # online graph reduction on STM->WM promotion (reference:
                # Memory::moveSignatureToWMFromSTM Memory.cpp:1447)
                if self.reduce_graph and self.reduce_node(moved):
                    continue
                self._wm_append(moved)
            else:
                self.delete_signature(moved)

    def _wm_append(self, sid: int):
        """WM insert + host mask upkeep (host_wm mirrors 'in WM and
        resident' at slot granularity for the appearance prep)."""
        self.wm.append(sid)
        s = self.signatures.get(sid)
        if s is not None and s.slot >= 0:
            self.host_wm[s.slot] = True
        if s is not None and s.weight < 0:
            self.n_inter_wm += 1

    def _wm_discard(self, sid: int):
        if sid in self.wm:
            self.wm.remove(sid)
            s = self.signatures.get(sid)
            if s is not None and s.weight < 0:
                self.n_inter_wm = max(self.n_inter_wm - 1, 0)

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
        if sid in self.stm:
            self.stm.remove(sid)
        self._wm_discard(sid)
        self.delete_signature(sid)

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

    def is_bad_signature(self, sig: Signature) -> bool:
        """Too few words for reliable loop closure (reference:
        Signature::isBadSignature — word count under Kp/BadSignRatio of
        the feature budget, Memory::createSignature Memory.cpp:5260)."""
        if sig.word_ids is None:
            return True
        budget = self.kp_max_features if self.kp_max_features > 0 else self.K
        n = int(np.sum(np.asarray(sig.word_ids) >= 0))
        return n < self.bad_sign_ratio * min(budget, self.K)

    def rehearsal(self, sig: Signature) -> int:
        """Compare to the previous STM signature; on similarity >= threshold
        MERGE the pair (reference: Memory::rehearsal Memory.cpp:4218 +
        rehearsalMerge :4274). Call AFTER add_to_stm so the odometry
        neighbor link exists (fullMerge requires it).

        Returns the id of the SURVIVING node when a merge happened (the
        caller must re-point its current-signature reference to it), else
        0. In localization mode only the weight is transferred."""
        if self.is_bad_signature(sig) and self.bad_signatures_ignored:
            self.last_rehearsal_sim = 0.0
            self.last_rehearsal_id = 0
            return 0
        prev = None
        for i in reversed(self.stm):
            s = self.signatures.get(i)
            if s is not None and s.id != sig.id and s.weight >= 0:
                prev = s
                break
        if prev is None:
            self.last_rehearsal_sim = 0.0
            self.last_rehearsal_id = 0
            return 0
        sim = self.similarity(sig, prev)
        self.last_rehearsal_sim = sim          # Statistics: Memory/Rehearsal sim/
        self.last_rehearsal_id = prev.id if sim >= self.rehearsal_sim else 0
        if sim < self.rehearsal_sim:
            return 0
        if not self.incremental:
            # localization mode: accumulate weight on the (transient) node
            sig.weight = sig.weight + 1 + prev.weight
            return 0
        return self.rehearsal_merge(prev.id, sig.id)

    def rehearsal_merge(self, old_id: int, new_id: int) -> int:
        """Merge two consecutive similar nodes (reference:
        Memory::rehearsalMerge Memory.cpp:4274). Default
        Mem/RehearsalIdUpdatedToNewOne=false keeps the OLD node (weights
        accumulate on it) and deletes the new one; =true keeps the NEW
        node and rewires the old node's links onto it. Merging only
        happens when the robot is stationary (odometry delta under
        RGBD/Linear|AngularUpdate). Returns the surviving id, or 0."""
        old = self.signatures.get(old_id)
        new = self.signatures.get(new_id)
        if old is None or new is None or not self.incremental:
            return 0
        lk = old.links.get(new_id)
        if lk is not None and lk.type != LINK_NEIGHBOR and \
                lk.type != LINK_NEIGHBOR_MERGED:
            return 0  # already merged
        # stationary check on the odometry link (reference :4302-4320)
        nb = new.links.get(old_id)
        moving = False
        if nb is not None:
            d = np.asarray(nb.transform, np.float32)
            lin = float(T.np_translation_norm(d))
            ang = float(T.np_rotation_angle(d))
            moving = (lin > self.rehearsal_max_distance or
                      ang > self.rehearsal_max_angle)
        if moving and self.rehearsal_weight_ignored_while_moving:
            return 0
        full_merge = (not moving) and nb is not None
        if not full_merge:
            # weight-only update (reference's intermediate-merge fallback)
            if self.rehearsal_id_updated_to_new:
                new.weight = max(old.weight, 0) + new.weight + 1
                old.weight = 0
            else:
                old.weight = max(new.weight, 0) + old.weight + 1
                new.weight = 0
            return 0
        if self.rehearsal_id_updated_to_new:
            # keep NEW: rewire old's links (composed through the odometry
            # delta) onto the new node, then drop the old node
            keep, drop = new, old
            t_keep_drop = nb.transform  # T_new_old
            for j, l in list(drop.links.items()):
                if j == keep.id:
                    continue
                t = T.np_compose(np.asarray(t_keep_drop, np.float32),
                                 np.asarray(l.transform, np.float32))
                if j not in keep.links:
                    self.add_link(Link(keep.id, j, l.type, t, l.information))
            keep.label = keep.label or drop.label
            keep.weight = max(drop.weight, 0) + keep.weight + 1
        else:
            # keep OLD (reference default): weights accumulate on it
            keep, drop = old, new
            keep.weight = max(drop.weight, 0) + keep.weight + 1
        self.remove_node(drop.id)
        if self.db is not None:
            self.db.delete_node(drop.id)
        return keep.id

    def reduce_node(self, sid: int) -> int:
        """Online graph reduction (reference: Memory::reduceNode
        Memory.cpp:1306, triggered from moveSignatureToWMFromSTM when
        Mem/ReduceGraph is on): when a node leaving STM carries a closure
        link, remove the node and rewire its partners to its odometry
        neighbors with kNeighborMerged links. Returns the id the node was
        reduced to, or 0."""
        s = self.signatures.get(sid)
        if s is None or s.label:
            return 0

        def reducible(l: Link) -> bool:
            return (l.to_id != l.from_id and l.to_id > 0 and
                    l.type not in (LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED,
                                   LINK_VIRTUAL_CLOSURE, LINK_POSE_PRIOR,
                                   LINK_GRAVITY, LINK_LANDMARK) and
                    s.user_data is None)

        reduced_to = 0
        neighbors = {j: l for j, l in s.links.items()
                     if l.type == LINK_NEIGHBOR}
        for j, l in s.links.items():
            if reducible(l):
                reduced_to = j
        if reduced_to == 0:
            return 0
        # rewire: every closure partner gets merged links to s's odometry
        # neighbors: T_partner_nbr = inv(T_s_partner) . T_s_nbr
        for j, l in list(s.links.items()):
            partner = self.signatures.get(j)
            if partner is None:
                continue
            if l.type not in (LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED,
                              LINK_VIRTUAL_CLOSURE):
                inv = T.np_inverse(np.asarray(l.transform, np.float32))
                for k, nbl in neighbors.items():
                    other = self.signatures.get(k)
                    if other is None or k == j or k in partner.links:
                        continue
                    t = T.np_compose(inv, np.asarray(nbl.transform,
                                                     np.float32))
                    self.add_link(Link(j, k, LINK_NEIGHBOR_MERGED, t,
                                       nbl.information))
        # persist the reduced node to LTM before dropping it from the graph
        # (reference passes keepLinkedInDb=true)
        if self.db is not None:
            s.in_ltm = True
            self.db.save_signature(s)
        self.remove_node(sid)
        return reduced_to

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
        self._wm_discard(sid)
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
            self._wm_append(sid)
            out.append(sid)
        return out

    # --------------------------------------------------- pairwise registration
    def compute_transform(self, from_id: int, to_id: int, cam: C.CameraModel,
                          key, guess=None, min_inliers: int = 20,
                          reproj_px: float = 4.0, iters: int = 256,
                          guess_window: Optional[bool] = None,
                          ) -> Tuple[Optional[np.ndarray], np.ndarray, int]:
        """Signature registration A->B: stored-descriptor mutual NNDR
        matching + PnP-RANSAC
        (reference: Memory::computeTransform Memory.cpp:3284 ->
        RegistrationVis::computeTransformationImpl).

        Correspondence modes (reference RegistrationVis.cpp:560-1150):
        - Vis/CorType=0 (default): descriptor matching; with a guess and
          ``guess_window`` (or Vis/CorGuessWinSize>0 forced by caller),
          candidates are restricted to the projected window.
        - Vis/CorType=1: optical-flow correspondences — A's keypoints are
          LK-tracked into B's image (requires both signatures to carry
          their grayscale image), seeded by the guess projection.
        - Vis/CorNNType=7: GMS re-ranking of the mutual matches.

        Returns (T_ab or None, covariance, inliers).
        """
        a = self.signatures[from_id]
        b = self.signatures[to_id]
        has_guess = guess is not None
        guess_arr = jnp.asarray(guess) if has_guess else T.identity()
        cam_tuple = (cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
                     cam.dist, cam.local_transform)
        if (self.cor_type == 1 and getattr(a, "image", None) is not None
                and getattr(b, "image", None) is not None):
            return self._compute_transform_flow(
                a, b, cam, cam_tuple, guess_arr if has_guess else None,
                key, iters, reproj_px, min_inliers)
        if (self.cor_nn_type == 6
                and getattr(a, "descf", None) is not None
                and getattr(b, "descf", None) is not None
                and self._ensure_matcher()):
            return self._compute_transform_superglue(
                a, b, cam, guess_arr if has_guess else None, key, iters,
                reproj_px, min_inliers)
        use_window = bool(guess_window) and has_guess and \
            self.guess_win_size > 0
        res, mm, extras = _registration_kernel(
            jnp.asarray(a.desc), jnp.asarray(a.valid3d), jnp.asarray(a.pts3d),
            jnp.asarray(a.uv),
            jnp.asarray(b.desc), jnp.asarray(b.valid3d), jnp.asarray(b.uv),
            jnp.asarray(b.pts3d), guess_arr, cam_tuple, key,
            iters, jnp.float32(reproj_px), min_inliers,
            nndr=jnp.float32(self.cor_nndr),
            window_px=jnp.float32(self.guess_win_size),
            use_window=use_window, use_gms=self.cor_nn_type == 7,
        )
        # ONE host transfer for every scalar/output — separate fetches
        # each pay a tunnel round trip (~6 RTTs -> 1 measured on-chip)
        success, transform, cov, n_inl, n_match, mean_d, distrib = \
            jax.device_get(
                (res.success, res.transform, res.covariance,
                 res.num_inliers, jnp.sum(mm.valid)) + extras)
        self._record_registration_host(int(n_inl), cov, int(n_match),
                                       float(mean_d), float(distrib))
        if not bool(success):
            return None, np.eye(6) * 9999.0, int(n_inl)
        return (np.asarray(transform), np.asarray(cov), int(n_inl))

    def compute_transform_batch(self, from_ids, to_id: int,
                                cam: C.CameraModel, key, guesses,
                                min_inliers: int = 20,
                                reproj_px: float = 4.0, iters: int = 256,
                                guess_window: Optional[bool] = None):
        """Batched signature registrations {A_i}->B in one dispatch+fetch
        (see `_registration_kernel_batch`). Only the default descriptor
        mode batches; flow/SuperGlue correspondence modes fall back to
        per-pair `compute_transform`.

        Returns [(T_ab or None, covariance, inliers), ...] per from_id."""
        if self.cor_type == 1 or self.cor_nn_type == 6 or not from_ids:
            out = []
            for i, g in zip(from_ids, guesses):
                key, sub = jax.random.split(key)
                out.append(self.compute_transform(
                    i, to_id, cam, sub, guess=g, min_inliers=min_inliers,
                    reproj_px=reproj_px, iters=iters,
                    guess_window=guess_window))
            return out
        handles = self.compute_transform_batch_async(
            from_ids, to_id, cam, key, guesses, min_inliers=min_inliers,
            reproj_px=reproj_px, iters=iters, guess_window=guess_window)
        return self.collect_transform_batch(handles)

    def compute_transform_batch_async(self, from_ids, to_id: int,
                                      cam: C.CameraModel, key, guesses,
                                      min_inliers: int = 20,
                                      reproj_px: float = 4.0,
                                      iters: int = 256,
                                      guess_window: Optional[bool] = None):
        """Dispatch-only half of compute_transform_batch: returns opaque
        handles for :meth:`collect_transform_batch`, letting the engine
        overlap the registration kernel + its D2H transfer with the other
        tick stages (tunnel RTT hiding). When the target signature's host
        arrays are still in flight (deferred create), the device frame
        handles are used directly — no host staging."""
        b = self.signatures[to_id]
        A = [self.signatures[i] for i in from_ids]
        cam_tuple = (cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
                     cam.dist, cam.local_transform)
        use_window = bool(guess_window) and self.guess_win_size > 0
        keys = jax.random.split(key, len(A))
        if b.desc is None and self._current_frame_dev is not None \
                and self._current_frame_id == to_id:
            b_desc, b_uv, b_pts, b_ok3 = self._current_frame_dev
        else:
            b_desc, b_uv, b_pts, b_ok3 = (jnp.asarray(b.desc),
                                          jnp.asarray(b.uv),
                                          jnp.asarray(b.pts3d),
                                          jnp.asarray(b.valid3d))
        res, mm, extras = _registration_kernel_batch(
            jnp.asarray(np.stack([a.desc for a in A])),
            jnp.asarray(np.stack([a.valid3d for a in A])),
            jnp.asarray(np.stack([a.pts3d for a in A])),
            jnp.asarray(np.stack([a.uv for a in A])),
            b_desc, b_ok3, b_uv, b_pts,
            jnp.asarray(np.stack([np.asarray(g, np.float32)
                                  for g in guesses])),
            cam_tuple, keys, iters, jnp.float32(reproj_px), min_inliers,
            jnp.float32(self.cor_nndr), jnp.float32(self.guess_win_size),
            use_window=use_window, use_gms=self.cor_nn_type == 7,
        )
        out = (res.success, res.transform, res.covariance, res.num_inliers,
               jnp.sum(mm.valid, axis=-1)) + extras
        for a in out:
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        return (out, len(A))

    def collect_transform_batch(self, handles):
        """Blocking half: fetch + per-pair results list (see
        compute_transform_batch)."""
        import jax

        out_dev, n_pairs = handles
        A = range(n_pairs)
        success, transform, cov, n_inl, n_match, mean_d, distrib = \
            jax.device_get(out_dev)
        out = []
        for p in range(len(A)):
            if bool(success[p]):
                out.append((np.asarray(transform[p]), np.asarray(cov[p]),
                            int(n_inl[p])))
            else:
                out.append((None, np.eye(6) * 9999.0, int(n_inl[p])))
        # stats of the last attempted registration (engine Loop/Visual*)
        last = len(A) - 1
        self._record_registration_host(int(n_inl[last]), cov[last],
                                       int(n_match[last]),
                                       float(mean_d[last]),
                                       float(distrib[last]))
        return out

    def _record_registration(self, res, matches: int):
        """Stash match-level stats of the LAST registration for the
        engine's Loop/Visual* statistics (reference: RegistrationInfo
        fields inliers/matches/inliersRatio/variance consumed at
        Rtabmap.cpp:2893-2906)."""
        self._record_registration_host(
            int(res.num_inliers), np.asarray(res.covariance), matches)

    def _record_registration_host(self, inl: int, cov, matches: int,
                                  mean_dist: float = 0.0,
                                  distribution: float = 0.0):
        cov = np.asarray(cov)
        self.last_registration = {
            "matches": matches,
            "inliers": inl,
            "inliers_ratio": inl / max(matches, 1),
            "variance": float(max(cov[0, 0], cov[5, 5])),
            "lin_variance": float(cov[0, 0]),
            "ang_variance": float(cov[5, 5]),
            "mean_dist": mean_dist,
            "distribution": distribution,
        }

    def _ensure_matcher(self) -> bool:
        """Resolve the Vis/CorNNType=6 matcher backend on first use.
        Empty PyMatcher/Path -> the bundled in-repo trained matcher
        (models/weights/superglue_distilled.npz); an .npz path -> the
        official-architecture converted checkpoint (set_superglue role).
        Returns True when a matcher is available."""
        if self.superglue_params is not None or self.py_matcher is not None:
            return True
        try:
            if self.pymatcher_path:
                from rtabmap_tpu.models import superglue_official as sgo

                self.superglue_params = sgo.load_params(self.pymatcher_path)
            else:
                from rtabmap_tpu.models.superglue import SuperGlueMatcher

                self.py_matcher = SuperGlueMatcher.distilled()
        except Exception as e:  # missing weights: fall back to NNDR path
            log.warning("CorNNType=6 matcher unavailable (%s); "
                        "falling back to NNDR matching", e)
            self.cor_nn_type = 1
            return False
        return True

    def _compute_transform_superglue(self, a: Signature, b: Signature,
                                     cam: C.CameraModel, guess, key,
                                     iters: int, reproj_px: float,
                                     min_inliers: int):
        """Attentional-matcher correspondence mode (reference: the
        PyMatcher bridge, Vis/CorNNType=6 -> rtabmap_superglue.py): the
        matcher produces the assignment; PnP estimates the transform from
        A's 3D and B's matched pixels."""
        # keypoint confidences are not persisted per node; both nets
        # tolerate a flat prior (the encoder sees score as one input
        # channel)
        sc_a = jnp.full((a.uv.shape[0],), 0.5, jnp.float32)
        sc_b = jnp.full((b.uv.shape[0],), 0.5, jnp.float32)
        if self.py_matcher is not None:
            va = jnp.asarray(np.any(a.desc != 0, axis=1))
            vb = jnp.asarray(np.any(b.desc != 0, axis=1))
            idx_ab, match_valid, _conf = self.py_matcher.match(
                jnp.asarray(a.descf), jnp.asarray(a.uv), sc_a, va,
                jnp.asarray(b.descf), jnp.asarray(b.uv), sc_b, vb,
                image_wh=(float(cam.width), float(cam.height)),
                threshold=self.pymatcher_threshold)
        else:
            from rtabmap_tpu.models.superglue_official import (
                match_from_scores, superglue_apply,
            )

            Z = superglue_apply(
                self.superglue_params, jnp.asarray(a.uv), sc_a,
                jnp.asarray(a.descf), jnp.asarray(b.uv), sc_b,
                jnp.asarray(b.descf), float(cam.width), float(cam.height),
                iters=50)
            idx_ab, match_valid, _score = match_from_scores(Z)
        w = match_valid & jnp.asarray(a.valid3d)
        res = R.ransac_pnp(
            jnp.asarray(a.pts3d), jnp.asarray(b.uv)[idx_ab], w, cam, key,
            iters=iters, reproj_px=jnp.float32(reproj_px),
            min_inliers=min_inliers, guess=guess)
        self._record_registration(res, int(jnp.sum(match_valid)))
        if not bool(res.success):
            return None, np.eye(6) * 9999.0, int(res.num_inliers)
        return (np.asarray(res.transform), np.asarray(res.covariance),
                int(res.num_inliers))

    def _compute_transform_flow(self, a: Signature, b: Signature,
                                cam: C.CameraModel, cam_tuple, guess,
                                key, iters: int, reproj_px: float,
                                min_inliers: int):
        """Optical-flow correspondence mode (reference: Vis/CorType=1,
        RegistrationVis.cpp:655-720 — LK-track A's keypoints into B's
        image, seeded by the guess projection, then PnP on A's 3D)."""
        from rtabmap_tpu.ops.flow import klt_track

        img_a = jnp.asarray(a.image)
        img_b = jnp.asarray(b.image)
        uv_a = jnp.asarray(a.uv)
        valid = jnp.asarray(a.valid3d)
        guess_uv = None
        if guess is not None:
            xb = T.apply(T.inverse(guess)[None], jnp.asarray(a.pts3d)[None])[0]
            uv_proj, z = C.project(xb, cam)
            guess_uv = jnp.where((z > 0)[:, None], uv_proj, uv_a)
        # Vis/CorFlowWinSize is the FULL window (cv::calcOpticalFlowPyrLK
        # semantics); klt_track's win is the radius. With a guess the
        # reference uses level 0 only (OPTFLOW_USE_INITIAL_FLOW)
        # with a projected guess, large pixel displacements are expected
        # (loop closures are wide-baseline) — disable the motion bound
        uv_b, ok = klt_track(img_a, img_b, uv_a, valid, guess_uv=guess_uv,
                             win=max(self.flow_win_size // 2, 2),
                             iters=self.flow_iterations,
                             levels=1 if guess is not None
                             else self.flow_max_level,
                             max_move=1e9 if guess is not None else 100.0)
        in_frame = ((uv_b[:, 0] >= 0) & (uv_b[:, 0] < cam.width) &
                    (uv_b[:, 1] >= 0) & (uv_b[:, 1] < cam.height))
        w = valid & ok & in_frame
        res = R.ransac_pnp(
            jnp.asarray(a.pts3d), uv_b, w, cam, key, iters=iters,
            reproj_px=jnp.float32(reproj_px), min_inliers=min_inliers,
            guess=guess)
        self._record_registration(res, int(jnp.sum(w)))
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

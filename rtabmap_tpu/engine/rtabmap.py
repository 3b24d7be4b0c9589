"""The SLAM engine: per-frame ``process()`` state machine.

Capability parity: the reference's ``Rtabmap`` class
(/root/reference/corelib/src/Rtabmap.cpp — ``process`` :1210 and the stage
breakdown in SURVEY.md §3.2): memory update + rehearsal, metric gating,
tf-idf likelihood -> Angeli adjustment -> Bayes posterior -> hypothesis
selection (value = 1 - P(virtual), accept at Rtabmap/LoopThr with
single-hypothesis and loop-ratio guards), LTM->WM retrieval around the
hypothesis, proximity detection in RGBD/LocalRadius, loop-closure
transform via shared words, graph optimization with the
RGBD/OptimizeMaxError reject gate, WM->LTM transfer bounded by
Rtabmap/MemoryThr / TimeThr, statistics, multi-session ``trigger_new_map``
and localization mode.

Host/device cut: policy & bookkeeping here (host), every heavy stage
(likelihood, posterior, registration RANSAC, graph optimization) is a
jitted kernel over the Memory slabs.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtabmap_tpu.bayes import filter as BF
from rtabmap_tpu.core.frame import FrameFeatures
from rtabmap_tpu.geometry import camera as C
from rtabmap_tpu.geometry import transform as T
from rtabmap_tpu.memory.memory import (
    LINK_GLOBAL_CLOSURE, LINK_LOCAL_SPACE_CLOSURE, LINK_LOCAL_TIME_CLOSURE,
    LINK_LANDMARK, LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED, LINK_POSE_PRIOR,
    LINK_USER_CLOSURE, LINK_VIRTUAL_CLOSURE, Link, Memory, Signature,
)
from rtabmap_tpu.optim import pose_graph as PG
from rtabmap_tpu.utils.graph import PoseStore
from rtabmap_tpu.utils.logging import Statistics, Timer, get_logger
from rtabmap_tpu.utils.params import Parameters


log = get_logger("engine")


from functools import partial


@partial(jax.jit, static_argnames=("use_tfidf",))
def _appearance_step(word_ids, node_words, lik_valid, word_nw, n_resident,
                     nbr_idx, nbr_margin, wm_valid, posterior, kernel,
                     vp_prior, use_tfidf: bool):
    """FUSED appearance stage: likelihood -> Angeli adjustment -> Bayes
    recursion -> hypothesis argmax as ONE device dispatch. The split
    version pays one host<->device round trip per stage — through a
    tunneled TPU (or any remote-offload deployment) the RTT dominates the
    sub-ms kernels, so the whole stage ships as a single program and the
    host fetches 3 scalars + the likelihood row in one transfer."""
    from rtabmap_tpu.vocab.dictionary import (
        adjust_likelihood, similarity_likelihood, tfidf_likelihood,
    )

    if use_tfidf:
        lik = tfidf_likelihood(word_ids, node_words, lik_valid, word_nw,
                               n_resident, word_nw.shape[0])
    else:
        lik = similarity_likelihood(word_ids, node_words, lik_valid)
    adj, virt = adjust_likelihood(lik, lik_valid)
    post = BF._predict_and_update(posterior, adj, virt, nbr_idx, nbr_margin,
                                  wm_valid, kernel, vp_prior)
    best_slot = jnp.argmax(post[:-1])
    return post, adj, best_slot, post[best_slot], post[-1]


def info_from_cov(cov: np.ndarray, min_var: float = 1e-6, max_var: float = 1e4) -> np.ndarray:
    """Robust 6x6 information from covariance: symmetrize + eigenvalue clip
    (the reference similarly bounds registration covariances before
    building link informations)."""
    c = np.asarray(cov, np.float64)
    c = 0.5 * (c + c.T)
    if not np.isfinite(c).all():
        return np.eye(6) * (1.0 / max_var)
    w, V = np.linalg.eigh(c)
    w = np.clip(w, min_var, max_var)
    return (V @ np.diag(1.0 / w) @ V.T).astype(np.float32)


class Rtabmap:
    def __init__(self, cam: C.CameraModel, params: Optional[Parameters] = None,
                 db=None, node_capacity: int = 1024, words_per_frame: int = 512,
                 seed: int = 42, mesh=None, shard_axis: str = "shard"):
        p = params or Parameters()
        self.params = p
        self.cam = cam
        # mesh: multi-chip mode — the Memory slabs (and the vocabulary)
        # live sharded over the mesh axis; every jitted stage partitions
        # via XLA GSPMD, and the graph-solve edge slabs are sharded in
        # _optimize. None = single-device (identical numerics modulo
        # reduction order).
        self.mesh, self.shard_axis = mesh, shard_axis
        # multi-PROCESS mesh (jax.distributed): device_get of an array
        # sharded over non-addressable devices is illegal — fetches of
        # sharded outputs must allgather (SURVEY §5.8)
        self._multihost = mesh is not None and jax.process_count() > 1
        self.memory = Memory(p, node_capacity=node_capacity,
                             words_per_frame=words_per_frame, db=db,
                             mesh=mesh, shard_axis=shard_axis)
        node_capacity = self.memory.node_capacity  # rounded to shards
        self.bayes = BF.BayesFilter(
            node_capacity,
            prediction_lc=[float(x) for x in str(p["Bayes/PredictionLC"]).split()],
            virtual_place_prior=float(p["Bayes/VirtualPlacePriorThr"]),
        )
        self.loop_thr = float(p["Rtabmap/LoopThr"])
        self.loop_ratio = float(p["Rtabmap/LoopRatio"])
        # epipolar hypothesis verification (reference: VhEp/* params,
        # Rtabmap.cpp:2193 -> EpipolarGeometry::check)
        self.vh_ep_enabled = bool(p["VhEp/Enabled"])
        self.vh_ep_match_count_min = int(p["VhEp/MatchCountMin"])
        self.vh_ep_ransac_param1 = float(p["VhEp/RansacParam1"])
        self.max_error = float(p["RGBD/OptimizeMaxError"])
        self.local_radius = float(p["RGBD/LocalRadius"])
        self.prox_max_paths = int(p["RGBD/ProximityMaxPaths"])
        self.prox_max_graph_depth = int(p["RGBD/ProximityMaxGraphDepth"])
        self.prox_filtering_radius = float(
            p["RGBD/ProximityPathFilteringRadius"])
        self.prox_odom_guess = bool(p["RGBD/ProximityOdomGuess"])
        self.max_loop_closure_distance = float(
            p["RGBD/MaxLoopClosureDistance"])
        self.prox_merged_scan_cov_factor = float(
            p["RGBD/ProximityMergedScanCovFactor"])
        self.prox_global_scan_map = bool(p["RGBD/ProximityGlobalScanMap"])
        self._global_scan_cache = None  # (n_nodes_when_built, pts, valid)
        self._pending_initial_pose: Optional[np.ndarray] = None
        self.proximity_by_time = bool(p["RGBD/ProximityByTime"])
        self.neighbor_link_refining = bool(p["RGBD/NeighborLinkRefining"])
        self.time_thr = float(p["Rtabmap/TimeThr"])        # ms, 0 = off
        self.memory_thr = int(p["Rtabmap/MemoryThr"])      # nodes, 0 = off
        self.min_inliers = int(p["Vis/MinInliers"])
        self.optimizer_robust = bool(p["Optimizer/Robust"])
        # iteration budget + convergence stop (reference:
        # Optimizer/Iterations, Optimizer/Epsilon — epsilon stops when the
        # relative chi2 improvement of a chunk falls below it)
        self.optimizer_iterations = int(p["Optimizer/Iterations"])
        self.optimizer_epsilon = float(p["Optimizer/Epsilon"])
        self.optimize_from_graph_end = bool(p["RGBD/OptimizeFromGraphEnd"])
        # incremental (affected-subgraph) optimization — the iSAM2 role
        # (reference: OptimizerGTSAM.cpp:111-124); full solves run every
        # Tpu/FullSolveEvery closures or when the subgraph grows too large
        self.incremental_optimization = bool(p["Tpu/IncrementalOptimization"])
        self.full_solve_every = int(p["Tpu/FullSolveEvery"])
        self._closures_since_full = 0
        self.rgbd_mode = bool(p["RGBD/Enabled"])
        self.detection_rate = float(p["Rtabmap/DetectionRate"])
        self.create_intermediate_nodes = bool(
            p["Rtabmap/CreateIntermediateNodes"])
        self.linear_update = float(p["RGBD/LinearUpdate"])
        self.angular_update = float(p["RGBD/AngularUpdate"])
        self.linear_speed_update = float(p["RGBD/LinearSpeedUpdate"])
        self.angular_speed_update = float(p["RGBD/AngularSpeedUpdate"])
        self.bin_data_kept = bool(p["Mem/BinDataKept"])
        self.retrieval_margin = 2  # graph-depth margin around hypothesis

        # localization-mode odometry cache (reference: _odomCachePoses/
        # _odomCacheConstraints, Rtabmap.cpp:1816-1842 update and :3335+
        # per-frame verification; RGBD/MaxOdomCacheSize)
        self.max_odom_cache_size = int(p["RGBD/MaxOdomCacheSize"])
        self.localization_smoothing = bool(p["RGBD/LocalizationSmoothing"])
        _prior_err = max(float(p["RGBD/LocalizationPriorError"]), 1e-6)
        self.localization_prior_inf = 1.0 / (_prior_err * _prior_err)
        self.aggressive_loop_thr = float(p["RGBD/AggressiveLoopThr"])
        self._odom_cache_poses: Dict[int, np.ndarray] = {}   # id -> odom pose
        self._odom_cache_links: Dict[Tuple[int, int], Link] = {}

        self.optimized_poses: Dict[int, np.ndarray] = PoseStore()
        self.landmark_poses: Dict[int, np.ndarray] = {}   # negative-id landmarks
        self._landmark_observers: Dict[int, List[int]] = {}
        self.map_correction = np.asarray(T.identity())
        self.last_hypothesis: Tuple[int, float] = (0, 0.0)
        self.loop_closure_id = 0
        self.last_proximity_id = 0
        self._last_process_stamp = -1e9
        self._last_pose: Optional[np.ndarray] = None
        self._distance_travelled: float = 0.0
        self._distance_at_last_loc: float = 0.0
        self._key = jax.random.PRNGKey(seed)
        self.stats_history: List[Statistics] = []

        # --- topological planner / goal tracking state (reference:
        # Rtabmap::computePath/updateGoalIndex, Rtabmap.h:233-276)
        self.goal_reached_radius = float(p["RGBD/GoalReachedRadius"])
        self.plan_stuck_iterations = int(p["RGBD/PlanStuckIterations"])
        self._path: List[Tuple[int, np.ndarray]] = []  # (node id, pose at plan time)
        self._path_current_index = 0
        self._path_goal_index = 0
        self._path_transform_to_goal = np.asarray(T.identity())
        self._path_unreachable: set = set()
        self._path_stuck_count = 0
        self._path_stuck_dist = 0.0
        self.path_status = 0  # 0 idle/cleared, 1 goal reached, -1 aborted

    # ------------------------------------------------------------------ utils
    @classmethod
    def load(cls, db, cam: C.CameraModel, params: Optional[Parameters] = None,
             node_capacity: int = 1024, words_per_frame: int = 512,
             new_session: bool = True, **kw) -> "Rtabmap":
        """Resume from a map store (reference: Rtabmap::init on an existing
        database, Memory::loadDataFromDb Memory.cpp:235 — last session
        loaded into WM, vocabulary restored without rebuild, sessions
        continue)."""
        from rtabmap_tpu.vocab.dictionary import VWDictionary

        admin = db.load_admin()
        slam = cls(cam, params, db=db, node_capacity=node_capacity,
                   words_per_frame=words_per_frame, **kw)
        mem = slam.memory
        if admin["vocab"] is not None:
            v = admin["vocab"]
            slab = np.zeros((v["capacity"], v["slab"].shape[1]), np.int8)
            slab[: v["n_words"]] = v["slab"]
            wv = np.zeros((v["capacity"],), bool)
            wv[: v["n_words"]] = True
            mem.vocab = VWDictionary.from_state({
                "slab": slab, "word_valid": wv, "n_words": v["n_words"],
                "nndr": v["nndr"], "incremental": v["incremental"],
            })
            mem.word_nw = jnp.zeros((mem.vocab.capacity,), jnp.float32)
        # load ALL signatures as LTM records; page last session into WM
        last_map = db.max_map_id()
        for sid in db.all_node_ids():
            sig = db.load_signature(sid)
            if sig is not None:
                mem.signatures[sid] = sig
        last_ids = sorted(i for i, s in mem.signatures.items() if s.map_id == last_map)
        budget = mem.node_capacity - mem.stm_size - 2
        for sid in last_ids[-budget:]:
            sig = mem.signatures[sid]
            sig.in_ltm = False
            mem._insert_slab(sig)
            mem._wm_append(sid)
        mem._next_id = db.max_node_id() + 1
        mem._map_id = last_map + 1 if new_session else last_map
        slam.optimized_poses.update(admin["optimized_poses"])
        return slam

    def _split_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def trigger_new_map(self):
        """(reference: Rtabmap::triggerNewMap Rtabmap.cpp:914): in mapping
        mode the optimized-pose cache is CLEARED — the new session is the
        only visible component until an appearance closure bridges it to
        an old session (whose poses then re-enter via the connected-
        component solve); the new session re-bases at the last known map
        pose on its first frame (Rtabmap.cpp:1347-1365) so an odometry
        restart keeps map-frame continuity."""
        last = self.get_last_location_id()
        self._last_localization_pose = (
            np.asarray(self.optimized_poses[last])
            if last and last in self.optimized_poses else None)
        self.memory.new_map()
        self.bayes.reset()
        self.last_hypothesis = (0, 0.0)
        self._odom_cache_poses.clear()
        self._odom_cache_links.clear()
        if self.memory.incremental:
            self.optimized_poses.clear()
            self.map_correction = np.asarray(T.identity())
            self._new_session_rebase = True

    # ---------------------------------------------------------------- process
    def process(self, frame: FrameFeatures, odom_pose, covariance=None,
                stamp: float = 0.0, scan=None,
                user_data: Optional[bytes] = None, grid=None,
                env_sensors=None, global_desc=None, gt_pose=None,
                velocity=None, gps=None, landmarks=None,
                raw=None, descf=None,
                extra_stats: Optional[Dict[str, float]] = None) -> Statistics:
        st = Statistics()
        if extra_stats:
            # upstream-stage metrics recorded into this node's row (the
            # reference's odometry/camera stats ride the same Statistics
            # map via RtabmapThread; e.g. Odometry/TotalTime/ms)
            for k, v in extra_stats.items():
                st.add(k, v)
        timer = Timer()
        odom_pose = np.asarray(odom_pose, np.float32)
        cov = np.asarray(covariance) if covariance is not None else np.eye(6) * 1e-4

        # --- detection-rate gate (reference gates in RtabmapThread; here we
        # keep it in-engine for the synchronous API). With
        # Rtabmap/CreateIntermediateNodes, gated frames become weight=-1
        # nodes: in the odometry chain (dense trajectory) but excluded
        # from rehearsal/hypotheses (reference: Rtabmap.cpp:1523+)
        if self.detection_rate > 0 and stamp > 0:
            if stamp - self._last_process_stamp < 1.0 / self.detection_rate - 1e-6:
                if self.create_intermediate_nodes and self.rgbd_mode:
                    self._add_intermediate_node(frame, odom_pose, cov, stamp,
                                                st)
                st.add("Rtabmap/Skipped", 1)
                return st
        self._last_process_stamp = stamp

        # --- odometry failure -> new session (covariance >= 9999 convention)
        if cov[0, 0] >= 9999.0 and self.memory.n_resident > 0:
            self.trigger_new_map()
        if getattr(self, "_new_session_rebase", False):
            # first frame of the new session: odometry may have restarted
            # anywhere — anchor it at the last known map pose
            if self._last_localization_pose is not None:
                self.map_correction = np.asarray(T.np_compose(
                    self._last_localization_pose, T.np_inverse(odom_pose)),
                    np.float32)
            self._new_session_rebase = False

        # --- user-seeded relocalization prior (reference:
        # Rtabmap::setInitialPose — in localization mode the next frame is
        # remapped so the robot starts at the given map pose)
        if self._pending_initial_pose is not None:
            self.map_correction = np.asarray(T.np_compose(
                self._pending_initial_pose, T.np_inverse(odom_pose)),
                np.float32)
            self._pending_initial_pose = None

        mc_before = np.asarray(self.map_correction).copy()
        n_sigs_before = len(self.memory.signatures)

        # --- B. memory update
        with st.time_stage("Timing/Memory update/ms"):
            prev_id = self.memory.stm[-1] if self.memory.stm else None
            with st.time_stage("TimingMem/Signature creation/ms"):
                # ASYNC create: device dispatch + async D2H copies only;
                # the blocking fetch happens once, after the appearance
                # step has also been dispatched (tunnel-RTT overlap)
                sig = self.memory.create_signature(frame, odom_pose, stamp,
                                                   deferred=True)
            for k, v in getattr(self.memory, "last_create_timings",
                                {}).items():
                st.add(k, v)
            # no dictionary-update thread to start/join in this design —
            # quantization is a synchronous fused dispatch (reference:
            # PreUpdateThread, Memory.cpp:5106)
            st.add("TimingMem/Pre update/ms", 0.0)
            st.add("TimingMem/Joining dictionary update/ms", 0.0)
            sig.scan = scan
            sig.user_data = user_data
            sig.grid = grid
            if env_sensors:
                sig.env_sensors = list(env_sensors)
            if global_desc is not None:
                sig.global_desc = np.asarray(global_desc)
            if gt_pose is not None:
                sig.gt_pose = np.asarray(gt_pose, np.float32)
            if velocity is not None:
                sig.velocity = np.asarray(velocity, np.float32)
            if gps is not None:
                # float64: geodetic degrees at f32 resolution quantize to
                # ~0.4 m at mid latitudes — never store fixes in f32
                sig.gps = np.asarray(gps, np.float64)
            if raw is not None and self.memory.cor_type == 1:
                # flow correspondences need the pixels (Vis/CorType=1)
                sig.image = np.asarray(raw[0]) if raw[0] is not None else None
            if descf is not None and self.memory.cor_nn_type == 6:
                # SuperGlue matching needs float descriptors (CorNNType=6)
                sig.descf = np.asarray(descf, np.float32)
            # raw sensor data kept with the node for later export /
            # reprocessing (reference: Mem/BinDataKept, compressed
            # image/depth in the Data table — Memory.cpp:6474,6583)
            if (raw is not None and self.bin_data_kept
                    and self.memory.db is not None):
                gray, depth = raw
                with st.time_stage("TimingMem/Compressing data/ms"):
                    self.memory.db.save_raw_frame(
                        sig.id, map_id=sig.map_id, stamp=stamp,
                        pose=odom_pose,
                        image=None if gray is None else np.asarray(gray),
                        depth=None if depth is None else np.asarray(depth))
            neighbor_link = None
            prev = self.memory.get(prev_id) if prev_id is not None else None
            if prev is not None and prev.map_id != sig.map_id:
                # never chain odometry across a session break — the
                # relative transform spans an odometry restart and is
                # meaningless (reference: neighbor links only within the
                # same map session; sessions join via loop closures)
                prev = None
            if prev is not None:
                t_ab = np.asarray(T.np_relative(prev.pose, odom_pose),
                                  np.float32)
                link_cov = cov
                # neighbor-link refining: polish the odometry link with scan
                # ICP when both nodes carry scans (reference:
                # RGBD/NeighborLinkRefining, Rtabmap.cpp:1626)
                if (self.neighbor_link_refining and scan is not None
                        and prev.scan is not None):
                    from rtabmap_tpu.ops.icp import register_scans

                    with st.time_stage("Timing/Neighbor link refining/ms"):
                        res, icp_cov = register_scans(
                            scan.xyz(), scan.valid, prev.scan.xyz(),
                            prev.scan.valid, guess=jnp.asarray(t_ab))
                    accepted = bool(res.valid)
                    st.add("NeighborLinkRefining/Accepted/", float(accepted))
                    st.add("NeighborLinkRefining/ICP inliers ratio/",
                           float(res.correspondence_ratio))
                    n_pts = float(jnp.sum(scan.valid))
                    st.add("NeighborLinkRefining/Pts/", n_pts)
                    st.add("NeighborLinkRefining/Inliers/",
                           float(res.correspondence_ratio) * n_pts)
                    # scan structural complexity: smallest/largest
                    # eigenvalue of the point covariance (reference:
                    # Icp/PointToPlaneMinComplexity gating)
                    pv = np.asarray(scan.xyz())[np.asarray(scan.valid)]
                    if pv.shape[0] >= 10:
                        w_eig = np.linalg.eigvalsh(np.cov(pv.T))
                        st.add("NeighborLinkRefining/ICP complexity/",
                               float(w_eig[0] / max(w_eig[-1], 1e-12)))
                    else:
                        st.add("NeighborLinkRefining/ICP complexity/", 0.0)
                    if accepted:
                        # deviation of the refined link from raw odometry
                        # (reference Rtabmap.cpp:1697-1702) — ONE fetch,
                        # then host numpy
                        t_ref, link_cov = jax.device_get(
                            (res.transform, icp_cov))
                        dev = T.np_relative(np.asarray(t_ab, np.float32),
                                            np.asarray(t_ref, np.float32))
                        st.add("NeighborLinkRefining/ICP translation/m",
                               float(T.np_translation_norm(dev)))
                        st.add("NeighborLinkRefining/ICP rotation/rad",
                               float(T.np_rotation_angle(dev)))
                        st.add("NeighborLinkRefining/Variance/",
                               float(np.max(np.diagonal(link_cov))))
                        t_ab = np.asarray(t_ref)
                        st.add("Odometry/Refined by scan/", 1)
                neighbor_link = Link(prev_id, sig.id, LINK_NEIGHBOR, t_ab,
                                     info_from_cov(link_cov))
            self.memory.add_to_stm(sig, neighbor_link)

        # --- C. metric gating: small displacement (computed BEFORE the
        # appearance dispatch/rehearsal so the device work can overlap the
        # deferred-create fetch; the flags depend only on poses/velocity)
        small_displacement = False
        if self._last_pose is not None:
            d = T.np_relative(self._last_pose, odom_pose)
            lin = T.np_translation_norm(d)
            ang = T.np_rotation_angle(d)
            self._distance_travelled += lin
            if (self.rgbd_mode and
                    self.linear_update > 0 and lin < self.linear_update and
                    self.angular_update > 0 and ang < self.angular_update):
                small_displacement = True
        self._last_pose = odom_pose
        # too-fast movement gate (reference: RGBD/Linear|AngularSpeedUpdate,
        # Rtabmap.cpp smallDisplacement||tooFastMovement hypothesis skip)
        too_fast = False
        if velocity is not None and self.rgbd_mode:
            v = np.asarray(velocity, np.float64).ravel()
            lin_s = float(np.linalg.norm(v[:3]))
            ang_s = float(np.linalg.norm(v[3:6])) if v.size >= 6 else 0.0
            too_fast = ((self.linear_speed_update > 0 and
                         lin_s > self.linear_speed_update) or
                        (self.angular_speed_update > 0 and
                         ang_s > self.angular_speed_update))
        st.add("Memory/Fast movement/", float(too_fast))
        st.add("Memory/Small movement/", float(small_displacement))
        st.add("Memory/Distance travelled/m", self._distance_travelled)
        st.add("Loop/Distance since last loc/m",
               self._distance_travelled - self._distance_at_last_loc)
        st.add("Memory/Odometry variance lin/", float(cov[0, 0]))
        st.add("Memory/Odometry variance ang/", float(cov[5, 5]))

        # --- D0. optimistic appearance DISPATCH: runs on device while the
        # deferred create's D2H copies are still in flight. Valid before
        # rehearsal because both rehearsal participants (new node + last
        # STM node) are STM — already masked out of likelihood and the WM
        # posterior; with the default Mem/RehearsalIdUpdatedToNewOne=true
        # the surviving node IS the new node, so its words are the ones
        # this dispatch used.
        wm_ids = list(self.memory.wm)
        app = None
        if wm_ids and not small_displacement and not too_fast:
            with st.time_stage("Timing/Posterior computation/ms"):
                app = self._dispatch_appearance(sig)

        # --- F0. proximity registration DISPATCH: the batched PnP kernel
        # and its D2H transfer run while the host is blocked on the
        # create fetch / appearance accept (path ranking uses last tick's
        # likelihood; candidates are geometric). Retrieved-this-tick
        # nodes join proximity from the NEXT tick (the reference's E->F
        # ordering made them immediate; one-tick lag, documented).
        prox_ctx = None
        if (self.rgbd_mode and not small_displacement
                and self.local_radius > 0 and self.memory.n_resident > 1):
            with st.time_stage("Timing/Proximity dispatch/ms"):
                prox_ctx = self._proximity_dispatch(sig, st)

        # --- B1b. the deferred create's SINGLE blocking fetch point
        with st.time_stage("TimingMem/Signature finalize/ms"):
            self.memory.finalize_signature()
        if sig.valid3d is not None:
            st.add("Memory/Triangulated points/",
                   float(np.sum(np.asarray(sig.valid3d))))

        # rehearsal AFTER add_to_stm so the odometry link exists and a
        # full merge can happen (reference: Memory::update order,
        # Memory.cpp:1018 — addSignatureToStm then rehearsal); needs the
        # finalized host word ids
        with st.time_stage("TimingMem/Rehearsal/ms"):
            merged_id = self.memory.rehearsal(sig)
        if merged_id and merged_id != sig.id:
            # current node merged away — continue the tick on the
            # surviving node (reference: _lastSignature = oldS). Only
            # happens with Mem/RehearsalIdUpdatedToNewOne=false; the
            # optimistic dispatch used the new node's words, so redo
            # with the survivor's (rare path, pays one extra RTT)
            self.optimized_poses.pop(sig.id, None)
            sig = self.memory.get(merged_id)
            if app is not None:
                app = self._dispatch_appearance(sig)
            prox_ctx = None  # stale B-side: re-run synchronously below
        st.add("Memory/RehearsalMerged", float(merged_id))

        # --- B2. odometry cache update (localization mode; reference:
        # Rtabmap.cpp:1816-1842 — rolling window of odometry poses +
        # neighbor constraints used to verify localization links)
        if not self.memory.incremental and self.max_odom_cache_size > 0:
            if self._odom_cache_poses:
                last_id = next(reversed(self._odom_cache_poses))
                t_oc = np.asarray(T.np_relative(
                    self._odom_cache_poses[last_id], odom_pose), np.float32)
                self._odom_cache_links[(last_id, sig.id)] = Link(
                    last_id, sig.id, LINK_NEIGHBOR, t_oc, info_from_cov(cov))
            self._odom_cache_poses[sig.id] = odom_pose
            with st.time_stage("Timing/Cleaning neighbors/ms"):
                while len(self._odom_cache_poses) > self.max_odom_cache_size:
                    old = next(iter(self._odom_cache_poses))
                    del self._odom_cache_poses[old]
                    self._odom_cache_links = {
                        k: v for k, v in self._odom_cache_links.items()
                        if old not in k}

        # --- D. appearance hypothesis ACCEPT (skipped for bad signatures —
        # reference: "Ignoring likelihood ... doesn't have enough visual
        # features", Rtabmap.cpp:2238; a discarded dispatch leaves the
        # Bayes posterior untouched, exactly like the legacy skip)
        bad_sig = (self.memory.bad_signatures_ignored and
                   self.memory.is_bad_signature(sig))
        hypothesis_id, hypothesis_value = 0, 0.0
        if app is not None and not bad_sig:
            mem = self.memory
            with st.time_stage("Timing/Likelihood computation/ms"):
                post, adj, best_slot, best_post, vp = app
                self.bayes.state = BF.BayesState(posterior=post)
                best_slot, best_post, vp, lik_host = self._fetch(
                    (best_slot, best_post, vp, adj))
                # kept for proximity path ranking (reference sorts nearest
                # paths by likelihood, Rtabmap.cpp:2796)
                self._last_likelihood = lik_host
            sid = int(mem._slot_to_id[int(best_slot)])
            if sid > 0 and float(best_post) > 0:
                # value = 1 - P(virtual place) (reference Rtabmap.cpp:2157)
                hypothesis_id, hypothesis_value = sid, float(1.0 - vp)
            st.add("Loop/Highest hypothesis id/", hypothesis_id)
            st.add("Loop/Highest hypothesis value/", hypothesis_value)
            st.add("Loop/Vp hypothesis/", float(vp))

        # --- accept rules (reference order, Rtabmap.cpp:2185-2212: single
        # hypothesis -> epipolar verification -> loop ratio)
        _t_hyp = time.perf_counter()
        loop_thr = self.loop_thr
        if (not self.memory.incremental and self.rgbd_mode and
                loop_thr > self.aggressive_loop_thr):
            # not yet localized to any previous session: loop aggressively
            # on the old map (reference: RGBD/AggressiveLoopThr,
            # Rtabmap.cpp:2166-2183)
            has_lc = any(l.type in (LINK_GLOBAL_CLOSURE,
                                    LINK_LOCAL_SPACE_CLOSURE, LINK_LANDMARK)
                         for l in self._odom_cache_links.values())
            if not has_lc:
                loop_thr = self.aggressive_loop_thr
        accepted_id = 0
        if hypothesis_id > 0 and hypothesis_value >= loop_thr:
            n_hyp = len(wm_ids)
            if n_hyp <= 1:
                log.debug("rejected hypothesis: single hypothesis")
            elif (self.vh_ep_enabled and
                  not self._verify_hypothesis_ep(sig, hypothesis_id, st)):
                log.debug("rejected hypothesis: by epipolar geometry")
            elif (self.loop_ratio > 0 and
                  (self.last_hypothesis[1] == 0.0 or
                   hypothesis_value < self.loop_ratio * self.last_hypothesis[1])):
                log.debug("rejected hypothesis: loop ratio")
                st.add("Loop/Suppressed hypothesis id/", hypothesis_id)
            else:
                accepted_id = hypothesis_id
        st.add("Timing/Hypotheses creation/ms",
               (time.perf_counter() - _t_hyp) * 1000.0)
        st.add("Loop/Accepted hypothesis id/", accepted_id)
        st.add("Loop/RejectedHypothesis/",
               float(hypothesis_id > 0 and hypothesis_value >= loop_thr
                     and accepted_id == 0))
        if self.last_hypothesis[1] > 0:
            st.add("Loop/Hypothesis ratio/",
                   hypothesis_value / self.last_hypothesis[1])
        self.last_hypothesis = (hypothesis_id, hypothesis_value)

        # --- E. retrieval: page hypothesis neighborhood back from LTM,
        # plus upcoming planned-path nodes (reference: Rtabmap.cpp:2408)
        if hypothesis_id > 0 or self._path:
            with st.time_stage("Timing/Retrieval/ms"):
                near = (self._graph_neighborhood(hypothesis_id, self.retrieval_margin)
                        if hypothesis_id > 0 else [])
                near += [i for i, _ in self._path[self._path_current_index:
                                                  self._path_goal_index + 3]]
                ltm_ids = [i for i in dict.fromkeys(near)
                           if (s := self.memory.get(i)) is not None and s.in_ltm]
                st.add("Loop/Reactivate id/", ltm_ids[0] if ltm_ids else 0)
                if ltm_ids:
                    if self.memory.db is not None:
                        # drain the async writer before reading back nodes
                        # (reference joins the DB trash thread before
                        # reactivation, Rtabmap.cpp:2240-2242)
                        with st.time_stage("Timing/Joining trash/ms"):
                            self.memory.db.flush()
                    with st.time_stage("Timing/Reactivation/ms"):
                        got = self.memory.retrieve(ltm_ids)
                    st.add("Memory/Retrieved/", len(got))
                    st.add("Memory/Signatures retrieved/", len(got))
                    st.add("Loop/Hypothesis reactivated/",
                           float(hypothesis_id in got))

        # --- G. loop-closure transform
        links_added: List[Link] = []
        if accepted_id > 0 and not self.rgbd_mode:
            # appearance-only mode (RGBD/Enabled=false): the hypothesis IS
            # the loop closure — no metric transform computed (reference
            # appearance-only pipeline, e.g. the BOWMapping example)
            self.loop_closure_id = accepted_id
            lk = Link(accepted_id, sig.id, LINK_GLOBAL_CLOSURE,
                      np.asarray(T.identity()), np.eye(6, dtype=np.float32))
            self.memory.add_link(lk)
        elif accepted_id > 0:
            with st.time_stage("Timing/Add loop closure link/ms"):
                t_ab, lc_cov, inliers = self.memory.compute_transform(
                    accepted_id, sig.id, self.cam, self._split_key(),
                    min_inliers=self.min_inliers,
                )
                st.add("Loop/Visual inliers/", inliers)
                reg = getattr(self.memory, "last_registration", {})
                st.add("Loop/Visual matches/", reg.get("matches", 0))
                st.add("Loop/Visual inliers ratio/",
                       reg.get("inliers_ratio", 0.0))
                st.add("Loop/Visual variance/", reg.get("variance", 0.0))
                st.add("Loop/Visual inliers mean dist/m",
                       reg.get("mean_dist", 0.0))
                st.add("Loop/Visual inliers distribution/",
                       reg.get("distribution", 0.0))
                st.add("Loop/Linear variance/", reg.get("lin_variance", 0.0))
                st.add("Loop/Angular variance/", reg.get("ang_variance", 0.0))
                st.add("Loop/Visual words/",
                       int(np.sum(np.asarray(sig.word_ids) >= 0)))
                if t_ab is not None:
                    lk = Link(accepted_id, sig.id, LINK_GLOBAL_CLOSURE, t_ab,
                              info_from_cov(lc_cov))
                    self.memory.add_link(lk)
                    links_added.append(lk)
                    self.loop_closure_id = accepted_id
                else:
                    accepted_id = 0

        # --- C2. proximity by TIME: in multi-session STM overlap, register
        # the new frame against resident STM nodes from OLDER sessions
        # (reference: Rtabmap.cpp:1885-1950, RGBD/ProximityByTime)
        if self.rgbd_mode and self.proximity_by_time:
            with st.time_stage("Timing/Proximity by time/ms"):
                n_time = 0
                for old_id in list(self.memory.stm)[:-1]:
                    old = self.memory.get(old_id)
                    if old is None or old.map_id == sig.map_id:
                        continue
                    t_ab, pcov, inl = self.memory.compute_transform(
                        old_id, sig.id, self.cam, self._split_key(),
                        min_inliers=self.min_inliers)
                    if t_ab is not None:
                        lk = Link(old_id, sig.id, LINK_LOCAL_TIME_CLOSURE,
                                  t_ab, info_from_cov(pcov))
                        self.memory.add_link(lk)
                        links_added.append(lk)
                        n_time += 1
                st.add("Proximity/Time links added/", n_time)
                st.add("Proximity/Time detections/", n_time)

        # --- F. proximity detection (local space closures) — collect the
        # early dispatch, or run synchronously when it was invalidated
        if self.rgbd_mode and not small_displacement and self.local_radius > 0:
            with st.time_stage("Timing/Proximity by space/ms"):
                if prox_ctx is not None:
                    prox_links = self._proximity_collect(sig, prox_ctx, st)
                else:
                    prox_links = self._proximity_detection(sig, st)
                links_added.extend(prox_links)
                st.add("Proximity/Space links added/", len(prox_links))
                n_paths, n_checked = getattr(self, "_last_prox_path_stats",
                                             (0, 0))
                st.add("Proximity/Space paths/", n_paths)
                st.add("Proximity/Space visual paths checked/", n_checked)
                n_vis, n_icp = getattr(self, "_last_prox_counts",
                                       (len(prox_links), 0))
                st.add("Proximity/Space detections added visually/", n_vis)
                st.add("Proximity/Space detections added icp multi/", n_icp)
                if prox_links:
                    st.add("Proximity/Space last detection id/",
                           prox_links[-1].from_id)
                closest = getattr(self, "_last_closest_node", None)
                if closest is not None:
                    st.add("Memory/Closest node distance/m", closest[0])
                    st.add("Memory/Closest node angle/rad", closest[1])

        # --- H. landmark closures (reference: Rtabmap.cpp:3203 stage H —
        # fiducial markers become negative-id graph nodes; re-observing a
        # landmark constrains the trajectory exactly like a loop closure)
        if landmarks:
            for lm in landmarks:
                lm_id = -abs(int(lm.id))
                inf6 = np.zeros((6, 6), np.float32)
                inf6[:3, :3] = np.eye(3) / max(lm.variance_linear, 1e-6)
                inf6[3:, 3:] = np.eye(3) / max(lm.variance_angular, 1e-6)
                if lm_id not in self._landmark_observers:
                    # resume support: recover observers from persisted links
                    prior = [s.id for s in self.memory.signatures.values()
                             if lm_id in s.links and s.id != sig.id]
                    if prior:
                        self._landmark_observers[lm_id] = prior
                lk = Link(sig.id, lm_id, LINK_LANDMARK,
                          np.asarray(lm.transform, np.float32), inf6)
                self.memory.add_link(lk)
                if self._landmark_observers.get(lm_id):
                    links_added.append(lk)  # re-observation == closure
                    st.add("Loop/Landmark detected/", -lm_id)
                    st.add("Loop/Landmark detected node ref/", sig.id)
                else:
                    st.add("Memory/New landmark/", -lm_id)
                self._landmark_observers.setdefault(lm_id, []).append(sig.id)
            st.add("Loop/Landmarks observed/", len(landmarks))

        # --- I. graph optimization (+ max-error reject gate) — or, in
        # localization mode, a direct map-correction update (the reference
        # optimizes its odometry cache instead of the frozen map graph,
        # Rtabmap.cpp:3300+; the correction below is the zero-cache case)
        if not self.memory.incremental:
            loc_link = next((lk for lk in links_added), None)
            # scan localization against the assembled GLOBAL scan map
            # (reference: RGBD/ProximityGlobalScanMap, Rtabmap.cpp
            # localization-mode global scan map) when no visual/proximity
            # link localized this frame
            if (loc_link is None and self.prox_global_scan_map
                    and getattr(sig, "scan", None) is not None):
                corrected = self._localize_global_scan(sig, odom_pose)
                if corrected is not None:
                    self.map_correction = np.asarray(T.np_compose(
                        corrected, T.np_inverse(odom_pose)), np.float32)
                    st.add("Loop/Localized/", 1)
                    st.add("Proximity/Space detections added icp global/", 1)
            if loc_link is not None and loc_link.to_id == sig.id:
                anchor = self.optimized_poses.get(loc_link.from_id)
                if anchor is None:
                    pass
                elif (self.max_odom_cache_size > 0 and
                        len(self._odom_cache_poses) > 1 and
                        sig.id in self._odom_cache_poses):
                    # verify the localization against the odometry cache
                    # before trusting it (reference: Rtabmap.cpp:3335+)
                    with st.time_stage("Timing/Map optimization/ms"):
                        corrected = self._localize_with_odom_cache(
                            sig, [lk for lk in links_added
                                  if lk.to_id == sig.id], odom_pose, st)
                    if corrected is not None:
                        self.map_correction = np.asarray(T.np_compose(
                            corrected, T.np_inverse(odom_pose)), np.float32)
                        st.add("Loop/Localized/", 1)
                    else:
                        # inconsistent with recent odometry: reject
                        cleared = 0
                        for lk in links_added:
                            if lk.to_id == sig.id:
                                self.memory.remove_link(lk.from_id, lk.to_id)
                                cleared += 1
                        st.add("Loop/Rejected by optimization/", 1)
                        st.add("Loop/Proximity links cleared/", cleared)
                        self.loop_closure_id = 0
                        accepted_id = 0
                else:
                    corrected = np.asarray(
                        T.np_compose(anchor, loc_link.transform), np.float32)
                    self.map_correction = np.asarray(T.np_compose(
                        corrected, T.np_inverse(odom_pose)), np.float32)
                    st.add("Loop/Localized/", 1)
            self.optimized_poses[sig.id] = np.asarray(
                T.np_compose(self.map_correction, odom_pose), np.float32)
        elif self.rgbd_mode:
            with st.time_stage("Timing/Map optimization/ms"):
                self._optimize(st, links_added)
        else:
            self.optimized_poses[sig.id] = odom_pose

        # repeated rejections mean an OLD wrong closure is pinning the
        # graph: repair by deleting the worst old closure links
        # (reference: repairGraph triggered from process, Rtabmap.cpp:5558)
        if st.get("Loop/Rejected by optimization/") > 0:
            self._consecutive_rejections = \
                getattr(self, "_consecutive_rejections", 0) + 1
            if (self.memory.incremental and
                    self._consecutive_rejections >= 2):
                removed = self.repair_graph(max_removals=2)
                st.add("Loop/Optimization max error removed count/",
                       len(removed))
                if removed:
                    st.add("Loop/Optimization max error removed from id/",
                           removed[0][0])
                    st.add("Loop/Optimization max error removed to id/",
                           removed[0][1])
                self._consecutive_rejections = 0
        elif accepted_id > 0 or st.get("Loop/Localized/") > 0:
            self._consecutive_rejections = 0

        # --- H2. goal tracking on the active planned path
        if self._path:
            with st.time_stage("Timing/Path planning/ms"):
                self.update_goal_index()
                st.add("Planning/Current goal id/", self.get_path_current_goal())
                st.add("Planning/Path length/", len(self.get_path()))
                st.add("Planning/Status/", self.path_status)

        # --- K. transfer (WM -> LTM)
        with st.time_stage("Timing/Memory cleanup/ms"):
            with st.time_stage("Timing/Forgetting/ms"):
                self._transfer(st, timer.elapsed() * 1000.0)

        # --- J/L statistics
        st.ref_id = sig.id
        st.loop_closure_id = self.loop_closure_id if accepted_id else 0
        if self.rgbd_mode:
            with st.time_stage("Timing/Statistics creation/ms"):
                self._pose_statistics(st, sig, mc_before)
        st.add("Memory/Signatures removed/",
               max(n_sigs_before + 1 - len(self.memory.signatures), 0))
        if not self.memory.incremental:
            st.add("Memory/Odom cache poses/", len(self._odom_cache_poses))
            st.add("Memory/Odom cache links/", len(self._odom_cache_links))
        _t_fin = time.perf_counter()
        st.add("Memory/Working memory size/", len(self.memory.wm))
        st.add("Memory/Short time memory size/", len(self.memory.stm))
        st.add("Memory/Short time memory inter size/",
               sum(1 for i in self.memory.stm
                   if (s := self.memory.get(i)) is not None and s.weight < 0))
        st.add("Memory/Working memory inter size/",
               self.memory.n_inter_wm)
        st.add("Proximity/Space scan paths checked/",
               getattr(self, "_last_scan_paths_checked", 0))
        if accepted_id > 0 or st.get("Loop/Localized/") > 0:
            # localization covariance summary (reference: MapToBase lin
            # std/var from the localization link covariance)
            reg = getattr(self.memory, "last_registration", {})
            lin_var = reg.get("lin_variance", 0.0)
            st.add("Loop/MapToBase lin var/m2", lin_var)
            st.add("Loop/MapToBase lin std/m", float(np.sqrt(max(lin_var, 0.0))))
        st.add("Memory/Local graph size/", self.memory.n_resident)
        st.add("Memory/Rehearsal sim/",
               getattr(self.memory, "last_rehearsal_sim", 0.0))
        st.add("Memory/Rehearsal id/",
               getattr(self.memory, "last_rehearsal_id", 0))
        st.add("Memory/Rehearsal merged/", st.get("Memory/RehearsalMerged"))
        st.add("Keypoint/Dictionary size/words", self.memory.vocab.n_words)
        st.add("Keypoint/Index memory usage/KB",
               self.memory.vocab.slab.size // 1024)  # int8 descriptor slab
        st.add("Keypoint/Current frame/words",
               int(np.sum(np.asarray(sig.word_ids) >= 0)))
        st.add("Keypoint/Indexed words/words", self.memory.vocab.n_words)
        st.add("Loop/Id/", accepted_id)
        st.add("Loop/Map id/", sig.map_id)
        st.add("Loop/Last id/", self.loop_closure_id)
        if accepted_id > 0 or st.get("Loop/Localized/") > 0 \
                or st.get("Proximity/Space links added/") > 0:
            # a (re)localization event resets the odometer for
            # Loop/Distance since last loc (Rtabmap.cpp:2545)
            self._distance_at_last_loc = self._distance_travelled
        if self.memory.db is not None and getattr(self.memory.db, "path", None):
            import os as _os

            if _os.path.exists(self.memory.db.path):
                st.add("Memory/Database memory used/MB",
                       _os.path.getsize(self.memory.db.path) / 1e6)
        with st.time_stage("Timing/RAM estimation/ms"):
            try:
                import resource

                st.add("Memory/RAM usage/MB",
                       resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0)
            except Exception:
                pass
            # estimated working-set of the core structures (reference:
            # Memory/RAM estimated — sums its containers' footprints)
            mem = self.memory
            slab_bytes = (mem.node_words.size * 4 + mem.node_uv.size * 4
                          + mem.node_pts.size * 4 + mem.node_valid.size
                          + mem.word_nw.size * 4
                          + mem.vocab.slab.size + mem.vocab.word_valid.size)
            sig_bytes = len(mem.signatures) * mem.K * (mem.vocab.slab.shape[1]
                                                       + 4 + 8 + 12 + 1)
            st.add("Memory/RAM estimated/MB",
                   (slab_bytes + sig_bytes) / 1e6)
        if "Memory/Images buffered/" not in st.data:
            # synchronous call path: no capture queue between the sensor
            # and the engine (the threaded pipeline overrides this via
            # extra_stats, like the reference's RtabmapThread queue)
            st.add("Memory/Images buffered/", 0)
        st.add("Timing/Finalizing statistics/ms",
               (time.perf_counter() - _t_fin) * 1000.0)
        st.add("Timing/Total/ms", timer.elapsed() * 1000.0)
        self.stats_history.append(st)
        if self.memory.db is not None:
            # persist the per-update statistics row (reference:
            # DBDriver::addStatistics called from Rtabmap::process end,
            # Rtabmap.cpp:3079; consumed by the Report tool / --loc stats)
            self.memory.db.save_statistics(sig.id, stamp, st.data)
        return st

    def _add_intermediate_node(self, frame, odom_pose, cov, stamp,
                               st: Statistics):
        """Weight=-1 node for a detection-rate-gated frame (reference:
        Rtabmap/CreateIntermediateNodes — keeps the full-rate odometry
        chain in the graph without feeding the appearance pipeline)."""
        mem = self.memory
        prev_id = mem.stm[-1] if mem.stm else None
        # no words: quantization skipped, an empty feature set is stored
        empty = FrameFeatures(
            uv=jnp.zeros_like(frame.uv), desc=jnp.zeros_like(frame.desc),
            pts3d=jnp.zeros_like(frame.pts3d),
            valid=jnp.zeros_like(frame.valid),
            valid3d=jnp.zeros_like(frame.valid3d),
            angle=jnp.zeros_like(frame.angle),
            response=jnp.zeros_like(frame.response))
        sig = mem.create_signature(empty, odom_pose, stamp, weight=-1)
        link = None
        prev = mem.get(prev_id) if prev_id is not None else None
        if prev is not None and prev.map_id == sig.map_id:
            t_ab = np.asarray(T.np_relative(prev.pose, odom_pose),
                              np.float32)
            link = Link(prev_id, sig.id, LINK_NEIGHBOR, t_ab,
                        info_from_cov(np.asarray(cov)))
        mem.add_to_stm(sig, link)
        self.optimized_poses[sig.id] = np.asarray(
            T.np_compose(self.map_correction, odom_pose), np.float32)
        st.ref_id = sig.id
        st.add("Memory/Short time memory inter size/",
               sum(1 for i in mem.stm
                   if (s := mem.get(i)) is not None and s.weight < 0))
        st.add("Memory/Working memory inter size/",
               sum(1 for i in mem.wm
                   if (s := mem.get(i)) is not None and s.weight < 0))

    def _pose_statistics(self, st: Statistics, sig: Signature, mc_before):
        """Odom-correction / MapToOdom / MapToBase / Gt/* statistic
        families (reference: Rtabmap.cpp:4200-4360 — the per-update pose
        bookkeeping block feeding Statistics)."""
        # host numpy throughout: a dozen device dispatches on lone 3x4
        # matrices would cost a tunnel round trip each (~250 ms/tick
        # measured on-chip at WM=1k before this change)
        mc = self.map_correction
        delta = T.np_compose(mc, T.np_inverse(mc_before))
        d6 = T.np_to_xyzrpy(delta)
        st.add("Loop/Odom correction norm/m", T.np_translation_norm(delta))
        st.add("Loop/Odom correction angle/deg",
               float(np.degrees(T.np_rotation_angle(delta))))
        for k, name in enumerate(("x/m", "y/m", "z/m")):
            st.add(f"Loop/Odom correction {name}", float(d6[k]))
        for k, name in enumerate(("roll/deg", "pitch/deg", "yaw/deg")):
            st.add(f"Loop/Odom correction {name}",
                   float(np.degrees(d6[3 + k])))
        m6 = T.np_to_xyzrpy(mc)
        st.add("Loop/MapToOdom norm/m", T.np_translation_norm(mc))
        st.add("Loop/MapToOdom angle/deg",
               float(np.degrees(T.np_rotation_angle(mc))))
        for k, name in enumerate(("x/m", "y/m", "z/m")):
            st.add(f"Loop/MapToOdom {name}", float(m6[k]))
        for k, name in enumerate(("roll/deg", "pitch/deg", "yaw/deg")):
            st.add(f"Loop/MapToOdom {name}", float(np.degrees(m6[3 + k])))
        base = self.optimized_poses.get(sig.id)
        if base is not None:
            b6 = T.np_to_xyzrpy(base)
            for k, name in enumerate(("x/m", "y/m", "z/m")):
                st.add(f"Loop/MapToBase {name}", float(b6[k]))
            for k, name in enumerate(("roll/deg", "pitch/deg", "yaw/deg")):
                st.add(f"Loop/MapToBase {name}", float(np.degrees(b6[3 + k])))
        # ground-truth error statistics (reference: graph::calcRMSE feeding
        # the Gt/* family when a ground truth is attached)
        if sig.gt_pose is not None:
            from rtabmap_tpu.utils import metrics as MET

            est, gt = [], []
            for i in sorted(self.optimized_poses):
                s = self.memory.get(i)
                if s is None or s.gt_pose is None or i < 0:
                    continue
                est.append(np.asarray(self.optimized_poses[i]))
                gt.append(np.asarray(s.gt_pose))
            if len(est) >= 2:
                for k, v in MET.gt_error_stats(np.stack(est),
                                               np.stack(gt)).items():
                    st.add(k, v)

    def _dispatch_appearance(self, sig: Signature):
        """ONE device dispatch for likelihood+adjust+Bayes+argmax; starts
        async D2H copies of the host-needed outputs and returns the
        handle tuple (post, adj, best_slot, best_post, vp) WITHOUT
        blocking. Accepts the in-flight deferred-create word ids."""
        mem = self.memory
        # host-side prep: STM mask + incremental neighbor table
        stm_slots = [mem.get(i).slot for i in mem.stm
                     if mem.get(i).slot >= 0]
        # host mirrors (no device fetch, no O(WM) Python scan)
        lik_valid = mem.host_valid.copy()
        if stm_slots:
            lik_valid[stm_slots] = False
        depth = min(self.bayes.kernel.shape[0] - 2, 8)
        tbl = mem.ensure_neighbor_table(depth, 2 * depth + 1)
        nbr_idx, nbr_margin = tbl.flush()
        wid = (sig.pending_word_ids if sig.pending_word_ids is not None
               else jnp.asarray(sig.word_ids))
        out = _appearance_step(
            wid, mem.node_words,
            jnp.asarray(lik_valid), mem.word_nw,
            jnp.float32(mem.n_resident), jnp.asarray(nbr_idx),
            jnp.asarray(nbr_margin), jnp.asarray(mem.host_wm),
            self.bayes.posterior, self.bayes.kernel,
            self.bayes.vp_prior,
            use_tfidf=mem.tfidf_likelihood_used)
        if not self._multihost:
            for a in out[1:]:
                try:
                    a.copy_to_host_async()
                except Exception:
                    pass
        return out

    def _fetch(self, tree):
        """Multihost-safe jax.device_get: arrays sharded over
        non-addressable devices are allgathered first (no-op pass-through
        on single-process meshes and plain arrays)."""
        if not self._multihost:
            return jax.device_get(tree)
        from jax.experimental import multihost_utils

        def one(a):
            if (hasattr(a, "sharding")
                    and not a.sharding.is_fully_replicated):
                return np.asarray(
                    multihost_utils.process_allgather(a, tiled=True))
            return jax.device_get(a)

        return jax.tree_util.tree_map(one, tree)

    # ---------------------------------------------------------- verification
    def _verify_hypothesis_ep(self, sig: Signature, hyp_id: int,
                              st: Statistics) -> bool:
        """Epipolar verification of the loop hypothesis (reference:
        EpipolarGeometry::check, EpipolarGeometry.cpp:65 — unique shared
        word correspondences, fundamental-matrix RANSAC, accept when
        inliers >= VhEp/MatchCountMin)."""
        from rtabmap_tpu.memory.memory import _shared_word_rows
        from rtabmap_tpu.ops.epipolar import check_hypothesis

        with st.time_stage("Timing/Hypotheses validation/ms"):
            old = self.memory.get(hyp_id)
            if old is None or old.uv is None or sig.uv is None:
                return False
            mem = self.memory
            if (mem.cor_nn_type == 6
                    and getattr(old, "descf", None) is not None
                    and getattr(sig, "descf", None) is not None
                    and mem._ensure_matcher()
                    and mem.py_matcher is not None):
                # learned stack: correspondences from the trained
                # attentional matcher instead of shared-word rows (with a
                # learned detector the binarized words are too coarse for
                # unique-pair extraction; the matcher is the learned
                # equivalent of EpipolarGeometry's word pairing)
                sc = jnp.full((old.uv.shape[0],), 0.5, jnp.float32)
                va = jnp.asarray(np.any(old.desc != 0, axis=1))
                vb = jnp.asarray(np.any(sig.desc != 0, axis=1))
                idx, okm, _conf = mem.py_matcher.match(
                    jnp.asarray(old.descf), jnp.asarray(old.uv), sc, va,
                    jnp.asarray(sig.descf), jnp.asarray(sig.uv), sc, vb,
                    image_wh=(float(self.cam.width), float(self.cam.height)),
                    threshold=mem.pymatcher_threshold)
                okm = np.asarray(okm)
                ia = np.nonzero(okm)[0]
                ib = np.asarray(idx)[ia]
            else:
                ia, ib = _shared_word_rows(old.word_ids, sig.word_ids)
            st.add("Loop/Epipolar pairs/", len(ia))
            if len(ia) < self.vh_ep_match_count_min:
                return False
            # pad correspondences to the static per-frame K so the kernel
            # compiles once per capacity (TPU static-shape discipline)
            K = self.memory.K
            uv_a = np.zeros((K, 2), np.float32)
            uv_b = np.zeros((K, 2), np.float32)
            valid = np.zeros((K,), bool)
            n = min(len(ia), K)
            uv_a[:n] = old.uv[ia[:n]]
            uv_b[:n] = sig.uv[ib[:n]]
            valid[:n] = True
            _ok, _F, inl = check_hypothesis(
                jnp.asarray(uv_a), jnp.asarray(uv_b), jnp.asarray(valid),
                self._split_key(), min_pairs=self.vh_ep_match_count_min,
                threshold_px=self.vh_ep_ransac_param1, inlier_ratio=0.0)
            inliers = int(jnp.sum(inl))
            st.add("Loop/Epipolar inliers/", inliers)
            # the reference accepts on inliers >= VhEp/MatchCountMin alone;
            # that is vacuous for a RANSAC model that always fits its own 8
            # samples. Gate instead on the null model: a random point lands
            # within RansacParam1 px of an epipolar line with
            # p ~ 2*thr*diag/area, and the best-of-iters selection inflates
            # the chance count to ~ mu + 3*sqrt(mu) + log(iters); require
            # clearing 8 samples + that tail before the reference minimum
            p_chance = (2.0 * self.vh_ep_ransac_param1 *
                        float(np.hypot(self.cam.width, self.cam.height)) /
                        (float(self.cam.width) * float(self.cam.height)))
            mu = n * p_chance
            null_gate = int(np.ceil(8 + mu + 3.0 * np.sqrt(mu) + 5.0))
            gate = max(self.vh_ep_match_count_min, null_gate)
            return inliers >= gate

    # -------------------------------------------------------------- proximity
    def _graph_neighborhood(self, sid: int, depth: int) -> List[int]:
        out = {sid}
        frontier = [sid]
        for _ in range(depth):
            nxt = []
            for i in frontier:
                s = self.memory.get(i)
                if s is None:
                    continue
                for j in s.links:
                    if j not in out:
                        out.add(j)
                        nxt.append(j)
            frontier = nxt
        return sorted(out)

    def _cluster_paths(self, cand_ids: List[int]) -> List[List[int]]:
        """Segment candidate nodes into PATHS: connected components over
        neighbor links restricted to the candidate set (reference:
        Rtabmap::getPaths, Rtabmap.cpp:2793)."""
        mem = self.memory
        cand = set(cand_ids)
        seen: set = set()
        paths: List[List[int]] = []
        for i in cand_ids:
            if i in seen:
                continue
            comp, frontier = [i], [i]
            seen.add(i)
            depth = 0
            while frontier and depth < max(self.prox_max_graph_depth, 1):
                nxt = []
                for a in frontier:
                    s = mem.get(a)
                    if s is None:
                        continue
                    for j, lk in s.links.items():
                        if (j in cand and j not in seen and lk.type in
                                (LINK_NEIGHBOR, LINK_NEIGHBOR_MERGED)):
                            seen.add(j)
                            comp.append(j)
                            nxt.append(j)
                frontier = nxt
                depth += 1
            paths.append(comp)
        return paths

    def _proximity_detection(self, sig: Signature,
                             st: Optional[Statistics] = None) -> List[Link]:
        """Find old nodes within RGBD/LocalRadius of the current optimized
        pose, segment them into paths, and register against the most
        likely node of each of the top RGBD/ProximityMaxPaths paths —
        adding one space closure PER PATH (reference: Rtabmap.cpp:2677-3130;
        path clustering :2793-2830, per-path registration :2828-2920)."""
        ctx = self._proximity_dispatch(sig, st)
        return self._proximity_collect(sig, ctx, st)

    def _proximity_dispatch(self, sig: Signature,
                            st: Optional[Statistics] = None):
        """Candidate search + path clustering + the batched registration
        DISPATCH (no fetch) — the engine calls this early in the tick so
        the PnP kernel and its D2H transfer overlap the create-fetch
        barrier and the appearance accept. Path ranking uses the LAST
        available likelihood (one tick stale when dispatched before the
        appearance accept — ranking only; the candidate set itself is
        purely geometric)."""
        mem = self.memory
        _t_search = time.perf_counter()
        cur_pose = self.optimized_poses.get(sig.id)
        if cur_pose is None:
            cur_pose = np.asarray(
                T.np_compose(self.map_correction, sig.pose), np.float32)
        recent = set(self._graph_neighborhood(sig.id, 6))  # skip recent chain
        # vectorized radius query over the compact pose store (replaces the
        # O(WM) Python scan; reference: Graph.cpp findNearestNodes KD-tree)
        near_ids, near_d = self.optimized_poses.nearest_within(
            cur_pose[:3, 3], self.local_radius)
        cands = []
        for i, d in zip(near_ids.tolist(), near_d.tolist()):
            if i in recent or i == sig.id or i not in mem.wm:
                continue
            if mem.get(i).slot < 0:
                continue
            cands.append((d, i))
        dist_by_id = {i: d for d, i in cands}
        if cands:
            d0, i0 = cands[0]
            ang = T.np_rotation_angle(T.np_relative(
                cur_pose, self.optimized_poses[i0]))
            self._last_closest_node = (d0, ang)
        else:
            self._last_closest_node = None

        def lik_of(i: int) -> float:
            s = mem.get(i)
            if s is None or s.slot < 0 or not hasattr(self, "_last_likelihood"):
                return 0.0
            return float(self._last_likelihood[s.slot])

        # paths sorted by (highest member likelihood, then proximity)
        paths = self._cluster_paths([i for _, i in cands])
        paths.sort(key=lambda pth: (max((lik_of(i) for i in pth), default=0.0),
                                    -min(dist_by_id[i] for i in pth)),
                   reverse=True)

        filtering_radius = self.prox_filtering_radius
        if self.max_loop_closure_distance > 0 and (
                filtering_radius <= 0 or
                self.max_loop_closure_distance < filtering_radius):
            filtering_radius = self.max_loop_closure_distance
        if st is not None:
            st.add("Timing/Proximity by space search/ms",
                   (time.perf_counter() - _t_search) * 1000.0)
        _t_vis = time.perf_counter()
        # select one registration target per path (host-side), then run
        # ALL of them as ONE batched device dispatch + fetch — the
        # reference registers serially per path (Rtabmap.cpp:2828-2920);
        # batched, P match matmuls share the MXU and one round trip
        pair_ids: List[int] = []
        pair_guesses: List[np.ndarray] = []
        for pth in paths:
            if self.prox_max_paths > 0 and \
                    len(pair_ids) >= self.prox_max_paths:
                break
            # nearest node of the path — or its most likely member if any
            best_lik = max(pth, key=lik_of)
            i = best_lik if lik_of(best_lik) > 0 else \
                min(pth, key=lambda j: dist_by_id[j])
            if i in mem.get(sig.id).links:
                continue
            if filtering_radius > 0 and dist_by_id[i] > filtering_radius:
                continue
            pair_ids.append(i)
            # RGBD/ProximityOdomGuess additionally restricts matching to a
            # guess-projected window (reference: computeTransform with
            # odometry guess -> projection correspondences)
            pair_guesses.append(np.asarray(
                T.np_relative(self.optimized_poses[i], cur_pose),
                np.float32))
        checked = len(pair_ids)
        handles = None
        if pair_ids:
            # only the default descriptor mode has an async batched
            # kernel; flow/SuperGlue modes register in collect
            if mem.cor_type != 1 and mem.cor_nn_type != 6:
                handles = mem.compute_transform_batch_async(
                    pair_ids, sig.id, self.cam, self._split_key(),
                    pair_guesses, min_inliers=self.min_inliers,
                    guess_window=self.prox_odom_guess)
        return {"pair_ids": pair_ids, "pair_guesses": pair_guesses,
                "handles": handles, "paths": paths, "cands": cands,
                "cur_pose": cur_pose, "checked": checked,
                "filtering_radius": filtering_radius, "t_vis": _t_vis,
                "sig_id": sig.id}

    def _proximity_collect(self, sig: Signature, ctx,
                           st: Optional[Statistics] = None) -> List[Link]:
        """Blocking half of proximity detection: fetch the batched
        registrations, add accepted space closures, then the scan-ICP
        fallback (reference stages Rtabmap.cpp:2828-3130)."""
        mem = self.memory
        if ctx is None:
            return []
        pair_ids = ctx["pair_ids"]
        filtering_radius = ctx["filtering_radius"]
        cands, cur_pose = ctx["cands"], ctx["cur_pose"]
        out: List[Link] = []
        results = []
        if ctx["handles"] is not None:
            results = mem.collect_transform_batch(ctx["handles"])
        elif pair_ids:
            results = mem.compute_transform_batch(
                pair_ids, ctx["sig_id"], self.cam, self._split_key(),
                ctx["pair_guesses"], min_inliers=self.min_inliers,
                guess_window=self.prox_odom_guess)
        for i, (t_ab, cov, inl) in zip(pair_ids, results):
            if t_ab is None:
                continue
            if (filtering_radius > 0 and
                    float(np.linalg.norm(t_ab[:3, 3])) > filtering_radius):
                continue  # resulting transform too large
            lk = Link(i, ctx["sig_id"], LINK_LOCAL_SPACE_CLOSURE, t_ab,
                      info_from_cov(cov))
            mem.add_link(lk)
            out.append(lk)
            self.last_proximity_id = i
        self._last_prox_path_stats = (len(ctx["paths"]), ctx["checked"])
        if st is not None:
            st.add("Timing/Proximity by space visual/ms",
                   (time.perf_counter() - ctx["t_vis"]) * 1000.0)

        # scan-matching proximity vs the ASSEMBLED local scan map of the
        # nearby path (reference: Memory::computeIcpTransformMulti,
        # Rtabmap.cpp:3038 — proximityMergedScanCovFactor :3088). Runs when
        # the current node carries a scan and nearby nodes do too; catches
        # closures in feature-poor / LiDAR-only operation.
        self._last_prox_counts = (len(out), 0)
        if (not out and getattr(sig, "scan", None) is not None and cands):
            scan_ids = [i for _, i in cands[: self.prox_max_paths]
                        if getattr(mem.get(i), "scan", None) is not None]
            if scan_ids:
                icp_links = self._proximity_scan_multi(sig, scan_ids, cur_pose)
                out.extend(icp_links)
                self._last_prox_counts = (0, len(icp_links))
        return out

    def _localize_with_odom_cache(self, sig: Signature, loc_links: List[Link],
                                  odom_pose, st: Statistics):
        """Verify + smooth a localization with the rolling odometry cache
        (reference: Rtabmap.cpp:3335-3760 — optimize the cache poses with
        the map anchors held by strong pose priors; reject the
        localization when the optimized graph's max edge-error ratio
        exceeds RGBD/OptimizeMaxError, i.e. the new link would teleport us
        against what odometry says). Returns the corrected map-frame pose
        of the current node, or None to reject."""
        cache_ids = [i for i in self._odom_cache_poses]
        id_set = set(cache_ids)
        cons: List[Link] = [lk for lk in self._odom_cache_links.values()]
        cons += [lk for lk in loc_links]
        # map anchors: constraint endpoints outside the cache with a known
        # optimized pose — held in place by priors (LocalizationPriorError)
        anchors = sorted({e for lk in cons for e in (lk.from_id, lk.to_id)
                          if e not in id_set and e in self.optimized_poses})
        if not anchors:
            return None
        ids = anchors + cache_ids
        idx = {i: k for k, i in enumerate(ids)}
        init = [np.asarray(self.optimized_poses[i], np.float32) for i in anchors]
        mc = np.asarray(self.map_correction, np.float32)
        init += [T.np_compose(mc, np.asarray(self._odom_cache_poses[i],
                                             np.float32))
                 for i in cache_ids]
        poses = np.stack(init)
        ef, et, meas, info = [], [], [], []
        for lk in cons:
            if lk.from_id in idx and lk.to_id in idx:
                ef.append(idx[lk.from_id])
                et.append(idx[lk.to_id])
                meas.append(np.asarray(lk.transform, np.float32))
                info.append(np.asarray(lk.information, np.float32))
        if not ef:
            return None
        pr_idx = np.arange(len(anchors), dtype=np.int32)
        pr_meas = poses[: len(anchors)]
        pr_info = np.tile(
            (np.eye(6) * self.localization_prior_inf).astype(np.float32)[None],
            (len(anchors), 1, 1))
        # pow2 padding: one compile per bucket (static-shape discipline)
        N, E, P = len(ids), len(ef), len(anchors)
        Np = 1 << max(N - 1, 1).bit_length()
        Ep = 1 << max(E - 1, 1).bit_length()
        Pp = 1 << max(P - 1, 1).bit_length()
        poses_p = np.concatenate(
            [poses, np.tile(np.eye(3, 4, dtype=np.float32), (Np - N, 1, 1))])
        ef_p = np.concatenate([np.array(ef, np.int32), np.zeros(Ep - E, np.int32)])
        et_p = np.concatenate([np.array(et, np.int32), np.zeros(Ep - E, np.int32)])
        meas_p = np.concatenate(
            [np.stack(meas), np.tile(np.eye(3, 4, dtype=np.float32), (Ep - E, 1, 1))])
        info_p = np.concatenate(
            [np.stack(info), np.tile(np.eye(6, dtype=np.float32)[None], (Ep - E, 1, 1))])
        pr_idx_p = np.concatenate([pr_idx, np.zeros(Pp - P, np.int32)])
        pr_meas_p = np.concatenate(
            [pr_meas, np.tile(np.eye(3, 4, dtype=np.float32), (Pp - P, 1, 1))])
        pr_info_p = np.concatenate([pr_info, np.zeros((Pp - P, 6, 6), np.float32)])
        g = PG.make_graph(
            jnp.asarray(poses_p), jnp.asarray(ef_p), jnp.asarray(et_p),
            jnp.asarray(meas_p), jnp.asarray(info_p),
            node_valid=jnp.asarray(np.arange(Np) < N),
            edge_valid=jnp.asarray(np.arange(Ep) < E), root=0,
            priors_idx=jnp.asarray(pr_idx_p),
            priors_meas=jnp.asarray(pr_meas_p),
            priors_info=jnp.asarray(pr_info_p),
            prior_valid=jnp.asarray(np.arange(Pp) < P))
        out, _chi2 = PG.optimize(g, iters=12)
        max_err = float(PG.solve_diagnostics(out)[0])
        st.add("Loop/Optimization max error ratio/", max_err)
        new_poses = np.asarray(out.poses)
        if not np.isfinite(new_poses[:N]).all() or not np.isfinite(max_err):
            return None
        if self.max_error > 0 and max_err > self.max_error:
            return None
        # accepted: keep the localization links in the cache so subsequent
        # frames are verified against them too (reference :3745-3760);
        # with LocalizationSmoothing the stored link is the OPTIMIZED
        # relative transform, smoothing successive corrections
        cur = new_poses[idx[sig.id]]
        for lk in loc_links:
            t = lk.transform
            if self.localization_smoothing:
                t = T.np_relative(np.asarray(new_poses[idx[lk.from_id]],
                                             np.float32),
                                  np.asarray(cur, np.float32))
            self._odom_cache_links[(lk.from_id, lk.to_id)] = Link(
                lk.from_id, lk.to_id, lk.type, t, lk.information)
        return cur

    def set_initial_pose(self, pose) -> None:
        """Seed the localization-mode map correction: the next processed
        frame will be placed at ``pose`` in the map frame (reference:
        Rtabmap::setInitialPose, Rtabmap.h)."""
        self._pending_initial_pose = np.asarray(pose, np.float32)

    def _localize_global_scan(self, sig: Signature, odom_pose):
        """Register the current scan against the GLOBAL assembled scan map
        (reference: RGBD/ProximityGlobalScanMap — in localization mode the
        whole map's scans are kept assembled; the current scan is matched
        against it to recover the map correction). Returns the corrected
        world pose of the current node, or None."""
        from rtabmap_tpu.ops.cloud import voxel_filter
        from rtabmap_tpu.ops.icp import register_scans

        mem = self.memory
        scan_nodes = [i for i in (mem.wm + mem.stm)
                      if i != sig.id and getattr(mem.get(i), "scan", None) is not None
                      and i in self.optimized_poses]
        if not scan_nodes:
            return None
        if (self._global_scan_cache is None
                or self._global_scan_cache[0] != len(scan_nodes)):
            pts_list, valid_list = [], []
            for i in scan_nodes:
                s = mem.get(i).scan
                P = jnp.asarray(self.optimized_poses[i])
                pts_list.append(np.asarray(T.apply(P[None], s.xyz()[None])[0]))
                valid_list.append(np.asarray(s.valid))
            pts = np.concatenate(pts_list)
            valid = np.concatenate(valid_list)
            cap = 1 << max(pts.shape[0] - 1, 1).bit_length()
            if cap > pts.shape[0]:
                pts = np.concatenate(
                    [pts, np.zeros((cap - pts.shape[0], 3), np.float32)])
                valid = np.concatenate(
                    [valid, np.zeros(cap - valid.shape[0], bool)])
            pts_j = jnp.asarray(pts)
            valid_j = voxel_filter(pts_j, jnp.asarray(valid), 0.05)
            self._global_scan_cache = (len(scan_nodes), pts_j, valid_j)
        _, map_pts, map_valid = self._global_scan_cache
        guess = T.compose(jnp.asarray(self.map_correction), jnp.asarray(odom_pose))
        res, _cov = register_scans(sig.scan.xyz(), sig.scan.valid,
                                   map_pts, map_valid, guess=guess, voxel=0.0)
        if not bool(res.valid):
            return None
        return np.asarray(T.orthonormalize(res.transform))

    def _proximity_scan_multi(self, sig: Signature, scan_ids: List[int],
                              cur_pose) -> List[Link]:
        """Register the current scan against nearby nodes' scans assembled
        in the nearest node's frame (computeIcpTransformMulti parity)."""
        from rtabmap_tpu.ops.icp import register_scans

        mem = self.memory
        self._last_scan_paths_checked = len(scan_ids)
        anchor = scan_ids[0]
        anchor_pose = jnp.asarray(self.optimized_poses[anchor])
        A_inv = T.inverse(anchor_pose)
        pts_list, valid_list = [], []
        for i in scan_ids:
            s = mem.get(i).scan
            rel = T.compose(A_inv, jnp.asarray(self.optimized_poses[i]))
            pts_list.append(np.asarray(T.apply(rel[None], s.xyz()[None])[0]))
            valid_list.append(np.asarray(s.valid))
        pts = np.concatenate(pts_list)
        valid = np.concatenate(valid_list)
        # cap the assembled slab (static-shape discipline: one pow2 bucket)
        cap = 1 << max(pts.shape[0] - 1, 1).bit_length()
        if cap > pts.shape[0]:
            pts = np.concatenate([pts, np.zeros((cap - pts.shape[0], 3), np.float32)])
            valid = np.concatenate([valid, np.zeros(cap - valid.shape[0], bool)])
        guess = T.relative(anchor_pose, jnp.asarray(cur_pose))
        res, icp_cov = register_scans(
            sig.scan.xyz(), sig.scan.valid, jnp.asarray(pts),
            jnp.asarray(valid), guess=guess)
        if not bool(res.valid):
            return []
        cov = np.asarray(icp_cov) * self.prox_merged_scan_cov_factor
        lk = Link(anchor, sig.id, LINK_LOCAL_SPACE_CLOSURE,
                  np.asarray(res.transform), info_from_cov(cov))
        mem.add_link(lk)
        self.last_proximity_id = anchor
        return [lk]

    # ------------------------------------------------------------ optimization
    def _build_graph(self):
        poses, links = self.memory.get_constraints(session_only=False)
        # optimize only the CONNECTED COMPONENT containing the latest node
        # (reference: optimizeCurrentMap -> graph::getConnectedGraph). A
        # disconnected component has no gauge: GN mangles it arbitrarily
        # (observed: a clean first-session lap distorted by metres once a
        # later session existed without inter-session links). Nodes outside
        # the component keep their previous optimized poses.
        if poses:
            adj = {}
            for lk in links:
                if lk.from_id in poses and lk.to_id in poses:
                    adj.setdefault(lk.from_id, []).append(lk.to_id)
                    adj.setdefault(lk.to_id, []).append(lk.from_id)
            root = max(poses)
            comp = {root}
            stack = [root]
            while stack:
                for nb in adj.get(stack.pop(), []):
                    if nb not in comp:
                        comp.add(nb)
                        stack.append(nb)
            poses = {i: p for i, p in poses.items() if i in comp}
            links = [lk for lk in links
                     if lk.from_id in comp
                     and (lk.to_id in comp or lk.to_id < 0)]
        ids = sorted(poses)
        id_to_idx = {i: k for k, i in enumerate(ids)}
        N = len(ids)

        def init_pose(i):
            p = self.optimized_poses.get(i)
            if p is None:
                # nodes without an optimized pose yet (this tick's node,
                # just-reconnected sessions) enter in the MAP frame —
                # raw odometry here is metres off whenever map_correction
                # is non-identity (post-session-break), which sent the
                # joint solve to NaN
                p = T.np_compose(self.map_correction,
                                 np.asarray(poses[i], np.float32))
            return np.asarray(p, np.float32)

        pose_arr = np.stack([init_pose(i) for i in ids]) \
            if N else np.zeros((0, 3, 4), np.float32)
        closure_types = {LINK_GLOBAL_CLOSURE, LINK_LOCAL_SPACE_CLOSURE,
                         LINK_LOCAL_TIME_CLOSURE, LINK_USER_CLOSURE}
        ef, et, meas, info, switch = [], [], [], [], []
        pr_idx, pr_meas, pr_info = [], [], []
        lm_links = []
        for lk in links:
            if lk.type == LINK_POSE_PRIOR:
                # unary absolute-pose prior (reference: kPosePrior links,
                # OptimizerG2O.cpp:634-685 prior edges)
                if lk.from_id in id_to_idx:
                    pr_idx.append(id_to_idx[lk.from_id])
                    pr_meas.append(lk.transform)
                    pr_info.append(lk.information)
                continue
            if lk.to_id < 0 and lk.from_id in id_to_idx:
                lm_links.append(lk)
                continue
            if lk.from_id in id_to_idx and lk.to_id in id_to_idx:
                ef.append(id_to_idx[lk.from_id])
                et.append(id_to_idx[lk.to_id])
                meas.append(lk.transform)
                info.append(lk.information)
                switch.append(lk.type in closure_types)
        # landmark nodes (reference: negative-id landmark vertices,
        # Rtabmap.cpp:3203 stage H): appended AFTER the regular nodes so the
        # gauge root (last regular node) keeps its index; initial pose =
        # first observer's pose ∘ measurement
        lm_ids = sorted({lk.to_id for lk in lm_links})
        if lm_ids:
            lm_init = []
            for lm in lm_ids:
                id_to_idx[lm] = N + len(lm_init)
                first = next(lk for lk in lm_links if lk.to_id == lm)
                obs_pose = pose_arr[id_to_idx[first.from_id]]
                lm_init.append(np.asarray(
                    T.compose(jnp.asarray(obs_pose),
                              jnp.asarray(first.transform)), np.float32))
            pose_arr = np.concatenate([pose_arr, np.stack(lm_init)])
            for lk in lm_links:
                ef.append(id_to_idx[lk.from_id])
                et.append(id_to_idx[lk.to_id])
                meas.append(lk.transform)
                info.append(lk.information)
                switch.append(False)
            ids = ids + lm_ids
        if not self.params.get("Optimizer/PriorsIgnored"):
            # GPS fixes -> ENU xyz priors anchored at the first fix
            # (reference: OptimizerG2O GPS prior path)
            from rtabmap_tpu.utils import gps as GPSU

            fixes = [(i, self.memory.get(i).gps) for i in ids if i >= 0
                     and getattr(self.memory.get(i), "gps", None) is not None]
            if fixes:
                origin = fixes[0][1]
                for nid, fix in fixes:
                    enu = GPSU.ecef_to_enu(
                        GPSU.geodetic_to_ecef(fix[2], fix[1], fix[3]),
                        origin[2], origin[1], origin[3])
                    m = np.eye(3, 4, dtype=np.float32)
                    m[:, 3] = enu
                    var = max(float(fix[4]) ** 2, 1e-4)
                    inf6 = np.zeros((6, 6), np.float32)
                    inf6[:3, :3] = np.eye(3) / var
                    pr_idx.append(id_to_idx[nid])
                    pr_meas.append(m)
                    pr_info.append(inf6)
        priors = (
            np.array(pr_idx, np.int32),
            (np.stack(pr_meas) if pr_meas else np.zeros((0, 3, 4), np.float32)),
            (np.stack(pr_info) if pr_info else np.zeros((0, 6, 6), np.float32)),
        )
        return ids, pose_arr, np.array(ef, np.int32), np.array(et, np.int32), \
            (np.stack(meas) if meas else np.zeros((0, 3, 4), np.float32)), \
            (np.stack(info) if info else np.zeros((0, 6, 6), np.float32)), \
            np.array(switch, bool), priors

    def _solve_padded(self, poses, ef, et, meas, info, switch, priors,
                      root_idx: int, st: Optional[Statistics] = None):
        """Pad to pow2/shard buckets, build the PoseGraph (edge slabs
        sharded when a mesh is set) and solve honoring Optimizer/Iterations
        with Optimizer/Epsilon convergence stop (chunked: GN chunks of up
        to 12 iterations; stop when a chunk improves chi2 by less than
        epsilon relative — reference Optimizer::epsilon_ semantics).

        Returns (out_graph, chi2, iters_done, max_err, lin_ratio,
        ang_ratio)."""
        N, E = poses.shape[0], len(ef)
        # coarse pow2 buckets with floors: every distinct shape is an
        # XLA:CPU compile, and this host's LLVM backend can segfault on
        # long many-compile runs — floors collapse the small-subgraph
        # solves into two shared shapes
        Np = max(1 << max(N - 1, 1).bit_length(), 32)
        Ep = max(1 << max(E - 1, 1).bit_length(), 64)
        if self.mesh is not None:
            # edge slab sharded over the mesh: pad to a shard multiple
            n_sh = self.mesh.shape[self.shard_axis]
            Ep = ((max(Ep, n_sh) + n_sh - 1) // n_sh) * n_sh
        poses_p = np.concatenate([poses, np.tile(np.eye(3, 4, dtype=np.float32), (Np - N, 1, 1))])
        node_valid = np.arange(Np) < N
        ef_p = np.concatenate([ef, np.zeros(Ep - E, np.int32)])
        et_p = np.concatenate([et, np.zeros(Ep - E, np.int32)])
        meas_p = np.concatenate([meas, np.tile(np.eye(3, 4, dtype=np.float32), (Ep - E, 1, 1))])
        info_p = np.concatenate([info, np.tile(np.eye(6, dtype=np.float32)[None], (Ep - E, 1, 1))])
        edge_valid = np.arange(Ep) < E
        pr_idx, pr_meas, pr_info = priors
        P = len(pr_idx)
        if P:  # pad priors to a pow2 bucket as well
            Pp = max(1 << max(P - 1, 1).bit_length(), 16)
            pr_idx = np.concatenate([pr_idx, np.zeros(Pp - P, np.int32)])
            pr_meas = np.concatenate(
                [pr_meas, np.tile(np.eye(3, 4, dtype=np.float32), (Pp - P, 1, 1))])
            pr_info = np.concatenate(
                [pr_info, np.zeros((Pp - P, 6, 6), np.float32)])
            prior_valid = np.arange(Pp) < P
        else:
            prior_valid = np.zeros((0,), bool)
        ef_j, et_j = jnp.asarray(ef_p), jnp.asarray(et_p)
        meas_j, info_j = jnp.asarray(meas_p), jnp.asarray(info_p)
        ev_j = jnp.asarray(edge_valid)
        if self.mesh is not None:
            # per-edge residual/Jacobian work partitions over chips; the
            # scatter-adds into the (replicated) pose vector become psums
            # (the sharded-PCG pattern, parallel/sharded.py docstring)
            from jax.sharding import NamedSharding, PartitionSpec as PS

            s1 = NamedSharding(self.mesh, PS(self.shard_axis))
            s3 = NamedSharding(self.mesh, PS(self.shard_axis, None, None))
            ef_j = jax.device_put(ef_j, s1)
            et_j = jax.device_put(et_j, s1)
            meas_j = jax.device_put(meas_j, s3)
            info_j = jax.device_put(info_j, s3)
            ev_j = jax.device_put(ev_j, s1)
        g = PG.make_graph(jnp.asarray(poses_p), ef_j, et_j,
                          meas_j, info_j,
                          node_valid=jnp.asarray(node_valid),
                          edge_valid=ev_j,
                          root=root_idx,
                          priors_idx=jnp.asarray(pr_idx, jnp.int32),
                          priors_meas=jnp.asarray(pr_meas, jnp.float32),
                          priors_info=jnp.asarray(pr_info, jnp.float32),
                          prior_valid=jnp.asarray(prior_valid, bool))
        budget = max(self.optimizer_iterations, 1)
        chunk = min(12, budget)
        if self.optimizer_robust:
            # Vertigo-equivalent robust mode (Optimizer/Robust): closure
            # edges become switchable via dynamic covariance scaling. The
            # DCS phi annealing schedule spans one optimize() call, so the
            # robust solve is a single chunk.
            switch_p = np.concatenate([switch, np.zeros(Ep - E, bool)])
            out, chi2 = PG.optimize(g, iters=chunk,
                                    switch_mask=jnp.asarray(switch_p))
            chi2 = float(chi2)
            iters_done = chunk
        else:
            if getattr(self, "_chi2_fn", None) is None:
                self._chi2_fn = jax.jit(PG.graph_chi2)
            prev = float(self._chi2_fn(g))
            out, chi2 = g, prev
            iters_done = 0
            while iters_done < budget:
                n = min(chunk, budget - iters_done)
                out, chi2 = PG.optimize(out, iters=n)
                chi2 = float(chi2)
                iters_done += n
                if not np.isfinite(chi2) or \
                        abs(prev - chi2) <= self.optimizer_epsilon * max(prev, 1e-12):
                    break
                prev = chi2
        # ONE jitted dispatch + ONE fetch for every diagnostic scalar
        diag_dev = PG.solve_diagnostics(out)
        diag = tuple(float(x) for x in jax.device_get(diag_dev))
        max_err = diag[0] if E else 0.0
        if st is not None:
            st.add("Loop/Optimization max error ratio/", max_err)
            st.add("Loop/Optimization error/", float(chi2))
            st.add("Loop/Optimization iterations/", iters_done)
        return out, chi2, iters_done, max_err, diag

    def _shortest_path_ids(self, a: int, b: int,
                           exclude_pairs: set) -> Optional[List[int]]:
        """BFS path a->b over the resident link graph, ignoring the edges
        in ``exclude_pairs`` (the just-added closures — otherwise the path
        would trivially be the new edge itself). Returns the node-id path
        or None when disconnected."""
        mem = self.memory
        prev = {a: 0}
        frontier = [a]
        while frontier and b not in prev:
            nxt = []
            for i in frontier:
                s = mem.get(i)
                if s is None:
                    continue
                for j in s.links:
                    if j < 0 or j in prev or \
                            (i, j) in exclude_pairs or (j, i) in exclude_pairs:
                        continue
                    prev[j] = i
                    nxt.append(j)
            frontier = nxt
        if b not in prev:
            return None
        path = [b]
        while path[-1] != a:
            path.append(prev[path[-1]])
        return path

    def _optimize_subgraph(self, st: Statistics,
                           new_links: List[Link]) -> bool:
        """Incremental (affected-subgraph) optimization: solve only the
        loop cycle closed by the new links (shortest existing path between
        the closure endpoints) plus a margin-2 neighborhood, with boundary
        nodes anchored at their current optimized poses by strong priors —
        the affected-clique role of iSAM2 (reference:
        OptimizerGTSAM.cpp:111-124). Every Tpu/FullSolveEvery closures the
        caller runs a full-graph solve instead, which also re-anchors any
        accumulated boundary error. Returns True when handled (else the
        caller falls back to the full solve)."""
        mem = self.memory
        if any(lk.to_id < 0 or lk.from_id < 0 for lk in new_links):
            return False  # landmark closures take the full path
        exclude = {(lk.from_id, lk.to_id) for lk in new_links}
        sel: set = set()
        for lk in new_links:
            path = self._shortest_path_ids(lk.from_id, lk.to_id, exclude)
            if path is None:
                return False  # disconnected (e.g. first inter-session link)
            sel.update(path)
        # margin: multi-source BFS of depth 2 around the cycle
        frontier = list(sel)
        for _ in range(2):
            nxt = []
            for i in frontier:
                s = mem.get(i)
                if s is None:
                    continue
                for j in s.links:
                    if j >= 0 and j not in sel:
                        sel.add(j)
                        nxt.append(j)
            frontier = nxt
        resident = mem.n_resident
        if len(sel) > 0.7 * resident:
            return False  # cycle covers most of the graph: full solve
        ids = sorted(i for i in sel if mem.get(i) is not None)
        if len(ids) < 2:
            return False
        idx = {i: k for k, i in enumerate(ids)}

        def init_pose(i):
            # this tick's new node has no optimized pose yet — seed it in
            # the map frame (odometry ∘ correction), like _build_graph's
            # fallback
            p = self.optimized_poses.get(i)
            if p is None:
                p = T.np_compose(self.map_correction, mem.get(i).pose)
            return np.asarray(p, np.float32)

        poses = np.stack([init_pose(i) for i in ids])
        closure_types = {LINK_GLOBAL_CLOSURE, LINK_LOCAL_SPACE_CLOSURE,
                         LINK_LOCAL_TIME_CLOSURE, LINK_USER_CLOSURE}
        ef, et, meas, info, switch = [], [], [], [], []
        pr_idx, pr_meas, pr_info = [], [], []
        seen = set()
        boundary = set()
        for i in ids:
            s = mem.get(i)
            for j, lk in s.links.items():
                if lk.type == LINK_POSE_PRIOR:
                    pr_idx.append(idx[i])
                    pr_meas.append(np.asarray(lk.transform, np.float32))
                    pr_info.append(np.asarray(lk.information, np.float32))
                    continue
                if j not in idx:
                    if j >= 0 and lk.type in (LINK_NEIGHBOR,
                                              LINK_NEIGHBOR_MERGED):
                        boundary.add(i)
                    continue
                key = (min(i, j), max(i, j))
                if key in seen:
                    continue
                seen.add(key)
                ef.append(idx[lk.from_id] if lk.from_id in idx else idx[i])
                et.append(idx[lk.to_id] if lk.to_id in idx else idx[j])
                meas.append(np.asarray(lk.transform, np.float32))
                info.append(np.asarray(lk.information, np.float32))
                switch.append(lk.type in closure_types)
        if not ef:
            return False
        # anchor boundary nodes at their current optimized poses so the
        # frozen remainder of the graph stays consistent
        for i in sorted(boundary):
            pr_idx.append(idx[i])
            pr_meas.append(poses[idx[i]])
            pr_info.append(np.eye(6, dtype=np.float32) * 1e4)
        priors = (np.asarray(pr_idx, np.int32),
                  (np.stack(pr_meas) if pr_meas
                   else np.zeros((0, 3, 4), np.float32)),
                  (np.stack(pr_info) if pr_info
                   else np.zeros((0, 6, 6), np.float32)))
        out, chi2, iters_done, max_err, _diag = self._solve_padded(
            poses, np.asarray(ef, np.int32), np.asarray(et, np.int32),
            np.stack(meas), np.stack(info), np.asarray(switch, bool),
            priors, root_idx=0, st=st)
        st.add("Loop/Optimization incremental/", 1)
        st.add("Loop/Optimization nodes/", len(ids))
        new_poses = np.asarray(out.poses)
        diverged = not np.isfinite(new_poses[: len(ids)]).all() \
            or not np.isfinite(max_err)
        if diverged or (self.max_error > 0 and max_err > self.max_error):
            for lk in new_links:
                self.memory.remove_link(lk.from_id, lk.to_id)
            st.add("Loop/Rejected by optimization/", 1)
            self.loop_closure_id = 0
            return True
        for k, i in enumerate(ids):
            self.optimized_poses[i] = new_poses[k]
        self._update_map_correction(max(ids))
        return True

    def _optimize(self, st: Statistics, new_links: List[Link]):
        # Without new constraints the graph optimum is unchanged — just
        # propagate the map correction onto the new node (the reference
        # equally skips optimizeCurrentMap when no closure was added).
        if not new_links:
            # only nodes created this tick can lack an optimized pose —
            # scanning all of WM here was O(WM) per closure-free tick
            for i in self.memory.stm:
                if i not in self.optimized_poses:
                    self.optimized_poses[i] = np.asarray(
                        T.np_compose(self.map_correction,
                                     self.memory.get(i).pose), np.float32)
            return
        # incremental mode: optimize the affected subgraph only, with a
        # periodic full solve (Tpu/IncrementalOptimization)
        if (self.incremental_optimization and
                self._closures_since_full < self.full_solve_every and
                self._optimize_subgraph(st, new_links)):
            self._closures_since_full += 1
            return
        self._closures_since_full = 0
        ids, poses, ef, et, meas, info, switch, priors = self._build_graph()
        if len(ids) < 2 or len(ef) < 1:
            for i in ids:
                self.optimized_poses[i] = np.asarray(
                    T.np_compose(self.map_correction,
                                 self.memory.get(i).pose), np.float32)
            if ids:
                self._update_map_correction(ids[-1])
            return
        N, E = len(ids), len(ef)
        n_reg = sum(1 for i in ids if i >= 0)  # landmarks appended after
        # gauge root (reference: RGBD/OptimizeFromGraphEnd — default false
        # anchors the FIRST node of the map; true anchors the latest)
        root_idx = n_reg - 1 if self.optimize_from_graph_end else 0
        out, chi2, iters_done, max_err, diag = \
            self._solve_padded(poses, ef, et, meas, info, switch, priors,
                               root_idx=root_idx, st=st)
        if len(ef):
            _max_err, max_ang_ratio, dlin_w, dang_w, k_lin, k_ang = diag
            # absolute max errors + offending edge endpoints (reference:
            # Rtabmap.cpp:4430-4460 maxLinearError/maxAngularError block)
            st.add("Loop/Optimization max ang error ratio/", max_ang_ratio)
            st.add("Loop/Optimization max error/m", dlin_w)
            st.add("Loop/Optimization max ang error/deg",
                   float(np.degrees(dang_w)))
            k_lin = min(int(k_lin), len(ef) - 1)
            k_ang = min(int(k_ang), len(ef) - 1)
            st.add("Loop/Optimization max error from id/",
                   float(ids[int(ef[k_lin])]))
            st.add("Loop/Optimization max error to id/",
                   float(ids[int(et[k_lin])]))
            st.add("Loop/Optimization max ang error from id/",
                   float(ids[int(ef[k_ang])]))
            st.add("Loop/Optimization max ang error to id/",
                   float(ids[int(et[k_ang])]))

        def propagate_missing():
            # keep every resident node addressable in map frame even when
            # the solve is discarded (new nodes get odometry ⊕ correction)
            for i in ids:
                if i >= 0 and i not in self.optimized_poses:
                    self.optimized_poses[i] = np.asarray(
                        T.np_compose(self.map_correction,
                                     self.memory.get(i).pose), np.float32)

        new_poses = np.asarray(out.poses)
        diverged = not np.isfinite(new_poses[: len(ids)]).all() or not np.isfinite(max_err)
        if new_links and (diverged or
                          (self.max_error > 0 and max_err > self.max_error)):
            # reject the new loop closures: remove links, keep old poses
            for lk in new_links:
                self.memory.remove_link(lk.from_id, lk.to_id)
            st.add("Loop/Rejected by optimization/", 1)
            self.loop_closure_id = 0
            propagate_missing()
            return
        if diverged:
            st.add("Loop/Optimization diverged/", 1)
            propagate_missing()
            return
        reg_ids = [i for i in ids if i >= 0]
        self.optimized_poses.bulk_set(
            reg_ids, np.stack([new_poses[k] for k, i in enumerate(ids)
                               if i >= 0]))
        for k, i in enumerate(ids):
            if i < 0:
                self.landmark_poses[i] = new_poses[k]
        self._update_map_correction(ids[n_reg - 1])

    def _update_map_correction(self, last_id: int):
        self.map_correction = np.asarray(T.np_compose(
            self.optimized_poses[last_id],
            T.np_inverse(self.memory.get(last_id).pose)), np.float32)

    # ---------------------------------------------------------------- transfer
    def _transfer(self, st: Statistics, elapsed_ms: float = 0.0):
        overflow = 0
        if self.memory_thr > 0:
            overflow = max(len(self.memory.wm) - self.memory_thr, 0)
        # immunization accounting (reference: Memory::getRemovableSignatures
        # immunized sets, Memory.cpp:2625-2750)
        n_recent = int(len(self.memory.wm) * self.memory.recent_wm_ratio)
        immune_global = (set(self._graph_neighborhood(self.loop_closure_id, 2))
                         if self.loop_closure_id else set())
        st.add("Memory/Immunized globally/", len(immune_global))
        st.add("Memory/Immunized locally/",
               len(self.memory.stm) + n_recent)
        st.add("Memory/Immunized locally max/", n_recent)
        # elapsed time of THIS tick so far (Timing/Total/ms is only
        # written after transfer — comparing against it reads 0)
        if self.time_thr > 0 and elapsed_ms > self.time_thr:
            overflow = max(overflow, max(len(self.memory.wm) // 10, 1))
        # slab almost full -> force transfer
        free = len(self.memory._free_slots)
        if free < self.memory.stm_size + 2:
            overflow = max(overflow, self.memory.stm_size + 2 - free)
        if overflow <= 0:
            return
        ids = self.memory.removable_ids(overflow, immune_global)
        with st.time_stage("Timing/Emptying trash/ms"):
            # enqueue the spilled nodes onto the async DB writer
            # (reference: moveToTrash + trash thread, Memory.cpp:2759)
            for i in ids:
                self.memory.move_to_ltm(i)
        st.add("Memory/Transferred/", len(ids))

    # ------------------------------------------------------- maintenance ops
    def detect_more_loop_closures(self, cluster_radius: float = 1.0,
                                  cluster_angle: float = 0.0,
                                  iterations: int = 1) -> int:
        """Offline: exhaustively try closures between nearby nodes and
        re-optimize (reference: Rtabmap::detectMoreLoopClosures
        Rtabmap.cpp:6026 / rtabmap-detectMoreLoopClosures tool)."""
        from rtabmap_tpu.utils import graph as G

        added_total = 0
        for _ in range(iterations):
            added = 0
            ids = [i for i in (self.memory.wm + self.memory.stm)
                   if self.memory.get(i) is not None]
            poses = {i: self.optimized_poses.get(i, self.memory.get(i).pose)
                     for i in ids}
            for i in ids:
                near = G.find_nearest_nodes(poses[i], poses, radius=cluster_radius,
                                            angle=cluster_angle)
                for j, _d in near:
                    if j <= i or j in self.memory.get(i).links:
                        continue
                    guess = np.asarray(T.relative(jnp.asarray(poses[i]),
                                                  jnp.asarray(poses[j])))
                    t_ab, cov, inl = self.memory.compute_transform(
                        i, j, self.cam, self._split_key(), guess=guess,
                        min_inliers=self.min_inliers)
                    if t_ab is None:
                        continue
                    # each closure is gated individually (reference gates
                    # per accepted closure, not per batch)
                    lk = Link(i, j, LINK_USER_CLOSURE, t_ab, info_from_cov(cov))
                    self.memory.add_link(lk)
                    st = Statistics()
                    self._optimize(st, [lk])
                    if st.get("Loop/Rejected by optimization/"):
                        continue
                    added += 1
            added_total += added
            if not added:
                break
        return added_total

    def refine_links(self) -> int:
        """Re-register every existing link and update its transform
        (reference: Rtabmap::refineLinks Rtabmap.cpp:6490)."""
        refined = 0
        seen = set()
        for sid in list(self.memory.signatures):
            sig = self.memory.get(sid)
            if sig is None or sig.desc is None:
                continue
            for j, lk in list(sig.links.items()):
                if (j, sid) in seen or (sid, j) in seen:
                    continue
                seen.add((sid, j))
                other = self.memory.get(j)
                if other is None or other.desc is None:
                    continue
                t_ab, cov, inl = self.memory.compute_transform(
                    lk.from_id, lk.to_id, self.cam, self._split_key(),
                    guess=lk.transform, min_inliers=self.min_inliers)
                if t_ab is not None:
                    new = Link(lk.from_id, lk.to_id, lk.type, t_ab, info_from_cov(cov))
                    self.memory.add_link(new)
                    refined += 1
        if refined:
            self._optimize(Statistics(), [])
        return refined

    def reject_last_loop_closure(self) -> bool:
        """Remove the most recent accepted global/proximity closure and
        re-optimize (reference: Rtabmap::rejectLastLoopClosure
        Rtabmap.cpp:5043 — the user-facing undo for a bad closure)."""
        closure_types = (LINK_GLOBAL_CLOSURE, LINK_LOCAL_SPACE_CLOSURE,
                         LINK_LOCAL_TIME_CLOSURE, LINK_USER_CLOSURE)
        best = None
        for sid, sig in self.memory.signatures.items():
            for j, lk in sig.links.items():
                if lk.type in closure_types:
                    key = max(lk.from_id, lk.to_id)
                    if best is None or key > best[0]:
                        best = (key, lk.from_id, lk.to_id)
        if best is None:
            return False
        self.memory.remove_link(best[1], best[2])
        self.loop_closure_id = 0
        self._optimize(Statistics(), [])
        return True

    def repair_graph(self, max_removals: int = 5) -> List[Tuple[int, int]]:
        """Delete old closure links that keep the optimized graph above the
        RGBD/OptimizeMaxError gate (reference: Rtabmap::repairGraph
        Rtabmap.cpp:5558 — triggered when new closures are repeatedly
        rejected because an OLD wrong link is pinning the graph). Greedy:
        while the worst edge-error ratio exceeds the gate, remove the
        closure link with the largest error and re-optimize."""
        closure_types = (LINK_GLOBAL_CLOSURE, LINK_LOCAL_SPACE_CLOSURE,
                         LINK_LOCAL_TIME_CLOSURE, LINK_USER_CLOSURE)
        removed: List[Tuple[int, int]] = []
        for _ in range(max_removals):
            ids, poses, ef, et, meas, info, switch, priors = self._build_graph()
            if len(ids) < 2 or len(ef) < 1:
                break
            n_reg = sum(1 for i in ids if i >= 0)
            # bucketed solve (shared compiles — an unpadded full-size graph
            # here was a fresh XLA:CPU executable per repair call)
            out, _chi2, _iters, max_err, _diag = self._solve_padded(
                poses, ef, et, meas, info, switch, priors,
                root_idx=n_reg - 1)
            if self.max_error <= 0 or not np.isfinite(max_err) \
                    or max_err <= self.max_error:
                break
            if getattr(self, "_edge_err_fn", None) is None:
                self._edge_err_fn = jax.jit(PG.edge_errors)
            lin, ang = jax.device_get(self._edge_err_fn(out))
            err = np.maximum(lin, ang)[: len(ef)]
            # find worst CLOSURE edge (never remove odometry neighbors)
            id_arr = list(ids)
            order = np.argsort(-err)
            target = None
            for e in order:
                a, b = id_arr[int(ef[e])], id_arr[int(et[e])]
                lk = self.memory.get(a).links.get(b) if self.memory.get(a) else None
                if lk is not None and lk.type in closure_types:
                    target = (a, b)
                    break
            if target is None:
                break
            self.memory.remove_link(*target)
            removed.append(target)
        if removed:
            self._optimize(Statistics(), [])
        return removed

    def add_user_link(self, from_id: int, to_id: int, transform=None) -> bool:
        """User-provided closure (reference: Rtabmap::addLink)."""
        if transform is None:
            t_ab, cov, _ = self.memory.compute_transform(
                from_id, to_id, self.cam, self._split_key(),
                min_inliers=self.min_inliers)
            if t_ab is None:
                return False
            info = info_from_cov(cov)
        else:
            t_ab = np.asarray(transform, np.float32)
            info = np.eye(6, dtype=np.float32)
        lk = Link(from_id, to_id, LINK_USER_CLOSURE, t_ab, info)
        self.memory.add_link(lk)
        self._optimize(Statistics(), [lk])
        return True

    def global_bundle_adjustment(self, iters: int = 10) -> bool:
        """Full BA over resident nodes: tracks from shared word ids,
        world points initialized from optimized poses
        (reference: Rtabmap::globalBundleAdjustment / OptimizerG2O
        optimizeBA, Rtabmap.h:215)."""
        from collections import defaultdict

        from rtabmap_tpu.optim import ba as BA

        ids = [i for i in sorted(self.memory.signatures)
               if (s := self.memory.get(i)) is not None and s.word_ids is not None
               and i in self.optimized_poses]
        if len(ids) < 2:
            return False
        id_to_cam = {i: k for k, i in enumerate(ids)}
        tracks = defaultdict(list)  # word -> [(cam_k, uv, world_pt)]
        for i in ids:
            s = self.memory.get(i)
            P = jnp.asarray(self.optimized_poses[i])
            world = np.asarray(T.apply(P[None], jnp.asarray(s.pts3d)[None])[0])
            wids = s.word_ids
            uniq, counts = np.unique(wids[wids >= 0], return_counts=True)
            dup = set(uniq[counts > 1].tolist())
            for k in range(len(wids)):
                w = int(wids[k])
                if w < 0 or w in dup or not s.valid3d[k]:
                    continue
                tracks[w].append((id_to_cam[i], s.uv[k], world[k]))
        # word ids alias distinct physical points (quantization); keep only
        # tracks whose per-node WORLD points agree metrically
        def consistent(obs):
            pts = np.stack([o[2] for o in obs])
            return np.linalg.norm(pts - pts.mean(0), axis=1).max() < 0.10

        tracks = {w: obs for w, obs in tracks.items()
                  if len(obs) >= 2 and consistent(obs)}
        if len(tracks) < 10:
            return False
        cam_idx, pt_idx, uvn, pts0 = [], [], [], []
        fx, fy = float(self.cam.fx), float(self.cam.fy)
        cx, cy = float(self.cam.cx), float(self.cam.cy)
        for p, (w, obs) in enumerate(tracks.items()):
            pts0.append(np.mean([o[2] for o in obs], axis=0))
            for ck, uv, _ in obs:
                cam_idx.append(ck)
                pt_idx.append(p)
                uvn.append([(uv[0] - cx) / fx, (uv[1] - cy) / fy])
        poses0 = jnp.stack([T.inverse(jnp.asarray(self.optimized_poses[i])) for i in ids])
        # two anchors: pins the frame AND the scale gauge (pure-projection
        # BA with one anchor leaves global scale free)
        fixed = jnp.zeros((len(ids),), bool).at[0].set(True).at[1].set(True)
        prob = BA.BAProblem(
            poses=poses0, points=jnp.asarray(np.stack(pts0)),
            cam_idx=jnp.asarray(cam_idx, jnp.int32),
            pt_idx=jnp.asarray(pt_idx, jnp.int32),
            uv=jnp.asarray(np.asarray(uvn, np.float32)),
            valid=jnp.ones((len(cam_idx),), bool), fixed_cams=fixed,
        )
        # dense Schur for local sizes; implicit Schur-CG once the
        # (Nc,Np,6,3) cross term would stop being "tiny" (map-scale BA)
        if len(ids) * len(tracks) > 600_000:
            out, cost = BA.bundle_adjust_large(prob, iters=iters,
                                               huber=4.0 / fx)
        else:
            out, cost = BA.bundle_adjust(prob, iters=iters, huber=4.0 / fx)
        new = np.asarray(jax.vmap(T.inverse)(out.poses))
        if not np.isfinite(new).all():
            return False
        for k, i in enumerate(ids):
            self.optimized_poses[i] = new[k]
        return True

    def set_label(self, node_id: int, label: str) -> bool:
        s = self.memory.get(node_id)
        if s is None:
            return False
        s.label = label
        return True

    def compute_path(self, goal_id: int) -> List[int]:
        """Topological path from the latest node to a goal node
        (reference: Rtabmap::computePath Rtabmap.h:233-243)."""
        from rtabmap_tpu.utils import graph as G

        if not self.memory.stm and not self.memory.wm:
            return []
        start = (self.memory.stm or self.memory.wm)[-1]
        adj = G.links_to_adjacency(self.memory.signatures)
        return G.compute_path(self.optimized_poses, adj, start, goal_id)

    # --------------------------------------------- goal tracking / following
    def set_goal(self, goal_id: int) -> bool:
        """Plan a topological path to a goal node and start tracking it
        (reference: Rtabmap::computePath(targetNode) Rtabmap.h:235)."""
        ids = self.compute_path(goal_id)
        if not ids or any(i not in self.optimized_poses for i in ids):
            self.path_status = -1
            return False
        self.clear_path(0)
        self._path = [(i, np.asarray(self.optimized_poses[i], np.float32))
                      for i in ids]
        self._path_transform_to_goal = np.asarray(T.identity())
        self.path_status = 0
        return True

    def set_goal_pose(self, goal_pose, tolerance: float = -1.0) -> bool:
        """Plan to a metric pose: snap to the nearest graph node within
        ``tolerance`` metres (<0 → RGBD/LocalRadius, 0 → unbounded) and
        keep the residual offset as the in-node goal transform
        (reference: Rtabmap::computePath(targetPose) Rtabmap.h:236)."""
        goal_pose = np.asarray(goal_pose, np.float32)
        if tolerance < 0:
            tolerance = self.local_radius
        best, best_d = 0, float("inf")
        for i, pose in self.optimized_poses.items():
            d = float(np.linalg.norm(pose[:3, 3] - goal_pose[:3, 3]))
            if d < best_d:
                best, best_d = i, d
        if best == 0 or (tolerance > 0 and best_d > tolerance):
            self.path_status = -1
            return False
        if not self.set_goal(best):
            return False
        self._path_transform_to_goal = np.asarray(
            T.relative(jnp.asarray(self.optimized_poses[best]),
                       jnp.asarray(goal_pose)))
        return True

    def clear_path(self, status: int):
        """Stop following the current path; status −1 aborted / 1 reached
        (reference: Rtabmap::clearPath)."""
        for i, _ in self._path:
            self.memory.remove_virtual_links(i)
        self._path = []
        self._path_current_index = 0
        self._path_goal_index = 0
        self._path_unreachable = set()
        self._path_stuck_count = 0
        self._path_stuck_dist = 0.0
        self.path_status = status

    def get_path(self) -> List[int]:
        """Remaining node ids on the active path (current → final goal)."""
        return [i for i, _ in self._path[self._path_current_index:]]

    def get_path_current_goal(self) -> int:
        """The intermediate goal node currently being driven to."""
        if not self._path:
            return 0
        return self._path[self._path_goal_index][0]

    def get_path_next_poses(self) -> List[np.ndarray]:
        """Optimized poses from the current node to the current goal —
        what a local trajectory follower consumes."""
        out = []
        for i, _ in self._path[self._path_current_index:self._path_goal_index + 1]:
            if i in self.optimized_poses:
                out.append(np.asarray(self.optimized_poses[i]))
        return out

    def update_goal_index(self) -> None:
        """Advance path tracking after a localization/mapping update
        (reference: Rtabmap::updateGoalIndex Rtabmap.cpp:7289): keep the
        path chain connected with virtual links, move the current index to
        the nearest path node, push the intermediate goal to the farthest
        optimized node within the local radius, detect goal-reached and
        stuck conditions."""
        if not self.rgbd_mode or not self._path:
            return

        # virtual links keep consecutive path nodes connected in the graph
        # so the graph optimizer and planner see one chain even across
        # sessions (reference inserts kVirtualClosure with cov 0.01*I)
        for i, _ in self._path[:self._path_current_index]:
            self.memory.remove_virtual_links(i)
        dist_so_far = 0.0
        for k in range(self._path_current_index + 1, len(self._path)):
            ia, pa = self._path[k - 1]
            ib, pb = self._path[k]
            if self.local_radius > 0:
                dist_so_far += float(np.linalg.norm(pb[:3, 3] - pa[:3, 3]))
            sa, sb = self.memory.get(ia), self.memory.get(ib)
            if ia != ib and sa is not None and sb is not None and ib not in sa.links:
                virt = np.asarray(T.relative(jnp.asarray(pb), jnp.asarray(pa)))
                # weak information (reference passes infMatrix = 0.01*I) so
                # the chain is connected but barely constrains optimization
                self.memory.add_link(Link(ib, ia, LINK_VIRTUAL_CLOSURE, virt,
                                          np.eye(6, dtype=np.float32) * 0.01))
            if 0 < self.local_radius < dist_so_far:
                break

        cur_id = (self.memory.stm or self.memory.wm)[-1]
        cur_pose = self.optimized_poses.get(cur_id)
        if cur_pose is None:
            self.clear_path(-1)
            return

        # goal reached?
        goal_id, goal_pose0 = self._path[-1]
        goal_pose = self.optimized_poses.get(goal_id, goal_pose0)
        goal_abs = np.asarray(T.compose(jnp.asarray(goal_pose),
                                        jnp.asarray(self._path_transform_to_goal)))
        if float(np.linalg.norm(cur_pose[:3, 3] - goal_abs[:3, 3])) \
                < self.goal_reached_radius:
            self.clear_path(1)
            return

        # farthest reachable intermediate goal within the local radius
        goal_index = self._path_current_index
        for k in range(self._path_current_index + 1, len(self._path)):
            if self._path[k][0] not in self.optimized_poses:
                break
            d = float(np.linalg.norm(
                self._path[k][1][:3, 3]
                - self._path[self._path_current_index][1][:3, 3]))
            if (goal_index == self._path_current_index and k == len(self._path) - 1) \
                    or k not in self._path_unreachable:
                goal_index = k
                if self.local_radius > 0 and d > self.local_radius:
                    break
        same_goal = goal_index == self._path_goal_index
        self._path_goal_index = goal_index

        # nearest path node = new current index
        best_k, best_d = self._path_current_index, float("inf")
        for k in range(self._path_current_index, self._path_goal_index + 1):
            p = self.optimized_poses.get(self._path[k][0])
            if p is None:
                continue
            d = float(np.linalg.norm(cur_pose[:3, 3] - p[:3, 3]))
            if d < best_d:
                best_k, best_d = k, d
        same_current = best_k == self._path_current_index
        if not same_current:
            self._path_current_index = best_k
            self._path_unreachable.discard(best_k)

        # stuck detection: no index progress and no distance progress
        if same_goal and same_current and self.plan_stuck_iterations > 0:
            d_goal = float(np.linalg.norm(
                cur_pose[:3, 3]
                - self.optimized_poses.get(self.get_path_current_goal(),
                                           goal_abs)[:3, 3]))
            if self._path_stuck_dist == 0.0 or d_goal < self._path_stuck_dist - 0.1:
                self._path_stuck_dist = d_goal
                self._path_stuck_count = 0
            else:
                self._path_stuck_count += 1
                if self._path_stuck_count > self.plan_stuck_iterations:
                    if self._path_goal_index < len(self._path) - 1:
                        self._path_unreachable.add(self._path_goal_index)
                        self._path_stuck_count = 0
                    else:
                        self.clear_path(-1)
        else:
            self._path_stuck_count = 0

    # --------------------------------------------------------------- exports
    def get_optimized_poses(self) -> Dict[int, np.ndarray]:
        return dict(self.optimized_poses)

    def get_graph(self):
        return self.memory.get_constraints(session_only=False)

    # ------------------------------------------------- Rtabmap.h accessors
    # (reference: Rtabmap.h:127-158 — the engine introspection surface)
    def get_wm(self) -> List[int]:
        return list(self.memory.wm)

    def get_stm(self) -> List[int]:
        return list(self.memory.stm)

    def get_wm_size(self) -> int:
        return len(self.memory.wm)

    def get_stm_size(self) -> int:
        return len(self.memory.stm)

    def is_in_stm(self, node_id: int) -> bool:
        return node_id in self.memory.stm

    def get_weights(self) -> Dict[int, int]:
        return {i: self.memory.get(i).weight
                for i in self.memory.wm + self.memory.stm}

    def get_total_mem_size(self) -> int:
        return len(self.memory.signatures)

    def get_last_location_id(self) -> int:
        return self.memory.stm[-1] if self.memory.stm else (
            self.memory.wm[-1] if self.memory.wm else 0)

    def get_pose(self, node_id: int):
        if node_id in self.optimized_poses:
            return np.asarray(self.optimized_poses[node_id])
        s = self.memory.get(node_id)
        return None if s is None else np.asarray(s.pose)

    def get_loop_closure_id(self) -> int:
        return self.loop_closure_id

    def get_highest_hypothesis(self) -> Tuple[int, float]:
        return self.last_hypothesis

    def get_map_correction(self) -> np.ndarray:
        return np.asarray(self.map_correction)

    def set_user_data(self, node_id: int, data: Optional[bytes]) -> bool:
        """Attach/replace a node's opaque user data post-hoc (reference:
        Rtabmap::setUserData, Rtabmap.h:168)."""
        s = self.memory.get(node_id)
        if s is None:
            return False
        s.user_data = data
        if s.in_ltm and self.memory.db is not None:
            self.memory.db.save_signature(s)
        return True

    def set_optimized_poses(self, poses: Dict[int, np.ndarray]) -> None:
        """Seed/override the optimized pose cache (reference:
        Rtabmap::setOptimizedPoses, Rtabmap.h:184 — used by the viewer's
        manual graph edits and priors-from-file)."""
        self.optimized_poses.update(
            {i: np.asarray(p, np.float32) for i, p in poses.items()})

    def delete_last_location(self) -> bool:
        """Drop the most recent node entirely (reference:
        Rtabmap::deleteLastLocation, Rtabmap.h:183)."""
        last = self.get_last_location_id()
        if not last:
            return False
        self.memory.remove_node(last)
        if self.memory.db is not None:
            self.memory.db.delete_node(last)
        self.optimized_poses.pop(last, None)
        if self.loop_closure_id == last:
            self.loop_closure_id = 0
        return True

    def reset_memory(self) -> None:
        """Clear everything and restart ids/sessions (reference:
        Rtabmap::resetMemory, Rtabmap.h:176)."""
        self.memory.clear()
        self.optimized_poses.clear()
        self.landmark_poses.clear()
        self._landmark_observers.clear()
        self.bayes.reset()
        self.map_correction = np.asarray(T.identity())
        self.loop_closure_id = 0
        self.last_hypothesis = (0, 0.0)
        self._last_pose = None
        self._odom_cache_poses.clear()
        self._odom_cache_links.clear()
        self.clear_path(0)

    def export_poses(self, path: str, fmt: int = 0,
                     optimized: bool = True) -> int:
        """Write the trajectory in one of the reference's 5 formats
        (reference: Rtabmap::exportPoses, Rtabmap.h:170-175)."""
        from rtabmap_tpu.tools.export_poses import export_poses

        poses = (self.get_optimized_poses() if optimized else
                 {i: self.memory.get(i).pose
                  for i in self.memory.wm + self.memory.stm})
        export_poses(path, fmt, poses)
        return len(poses)

    def generate_dot_graph(self, path: str) -> int:
        """GraphViz DOT dump of the pose graph (reference:
        Rtabmap::generateDOTGraph, Rtabmap.h:169). Loop closures render
        as dashed red edges, landmarks as boxes."""
        from rtabmap_tpu.memory.memory import LINK_NEIGHBOR

        poses, links = self.get_graph()
        n = 0
        with open(path, "w") as fp:
            fp.write("graph map {\n  node [shape=circle];\n")
            for i in sorted(poses):
                p = np.asarray(poses[i])[:, 3]
                shape = "box" if i < 0 else "circle"
                fp.write(f'  n{abs(i)} [shape={shape}, '
                         f'pos="{p[0]:.2f},{p[1]:.2f}!", '
                         f'label="{i}"];\n')
            seen = set()
            for lk in links:
                key = (min(lk.from_id, lk.to_id), max(lk.from_id, lk.to_id))
                if key in seen:
                    continue
                seen.add(key)
                style = ("" if lk.type == LINK_NEIGHBOR
                         else ' [style=dashed, color=red]')
                fp.write(f"  n{abs(lk.from_id)} -- n{abs(lk.to_id)}{style};\n")
                n += 1
            fp.write("}\n")
        return n

    def get_signature_copy(self, node_id: int, with_words: bool = True,
                           with_scan: bool = False,
                           with_user_data: bool = False,
                           with_grid: bool = False,
                           with_global_descriptors: bool = False):
        """Detached copy of a node, loading from LTM if needed
        (reference: Rtabmap::getSignatureCopy, Rtabmap.h:185)."""
        import copy

        s = self.memory.get(node_id)
        if s is None and self.memory.db is not None:
            s = self.memory.db.load_signature(node_id)
        if s is None:
            return None
        out = copy.copy(s)
        out.links = dict(s.links)
        if not with_words:
            out.word_ids = out.desc = out.uv = out.pts3d = out.valid3d = None
        if not with_scan:
            out.scan = None
        if not with_user_data:
            out.user_data = None
        if not with_grid:
            out.grid = None
        if not with_global_descriptors:
            out.global_desc = None
        return out

    def get_3d_map(self, optimized: bool = True, global_map: bool = True):
        """(signatures, poses, constraints) of the current graph
        (reference: Rtabmap::get3DMap/getGraph, Rtabmap.h:188-200)."""
        poses, links = self.memory.get_constraints(
            session_only=not global_map)
        if optimized:
            poses = {i: self.optimized_poses.get(i, p)
                     for i, p in poses.items()}
        sigs = {i: self.memory.get(i) for i in poses}
        return sigs, {i: np.asarray(p) for i, p in poses.items()}, links

    def dump_prediction(self, path: str) -> None:
        """Write the dense Bayes prediction matrix over resident nodes
        (reference: Rtabmap::dumpPrediction, Rtabmap.h:177 →
        BayesFilter::generatePrediction)."""
        mem = self.memory
        depth = min(self.bayes.kernel.shape[0] - 2, 8)
        tbl = mem.ensure_neighbor_table(depth, 2 * depth + 1)
        nbr_idx, nbr_margin = tbl.flush()
        wm_valid = mem.host_wm
        P = BF.prediction_matrix(nbr_idx, nbr_margin, wm_valid,
                                 np.asarray(self.bayes.kernel),
                                 float(self.bayes.vp_prior))
        np.savetxt(path, P, fmt="%.6f")

    def write_log_files(self, directory: str):
        """Dump the per-tick statistics history as CSVs (reference:
        Rtabmap::setupLogFiles LogF.txt/LogI.txt, Rtabmap.cpp:195 — float
        timings in LogF, integer counters/ids in LogI)."""
        import csv
        import os

        keys = sorted({k for st in self.stats_history for k in st.data})
        int_keys = [k for k in keys
                    if all(float(st.get(k, 0.0)).is_integer()
                           for st in self.stats_history)]
        float_keys = [k for k in keys if k not in int_keys]

        def dump(path, cols, cast):
            with open(path, "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["ref_id", "loop_id"] + cols)
                for st in self.stats_history:
                    w.writerow([st.ref_id, st.loop_closure_id]
                               + [cast(st.get(k, 0.0)) for k in cols])

        path_f = os.path.join(directory, "LogF.csv")
        dump(path_f, float_keys, float)
        dump(os.path.join(directory, "LogI.csv"), int_keys,
             lambda v: int(float(v)))
        return path_f

    def close(self, map2d=None, opt_cloud=None, opt_mesh=None):
        """Persist the full map state (the database IS the checkpoint —
        reference: Memory::close + saveOptimizedPoses/save2DMap/
        saveOptimizedMesh, Memory.cpp:2486-2559). Derived products (2D
        occupancy map, assembled cloud, mesh) are checkpointed when given."""
        if self.memory.db is not None:
            for i in list(self.memory.wm) + list(self.memory.stm):
                self.memory.db.save_signature(self.memory.get(i))
            self.memory.db.save_admin(
                params=self.params.overrides(),
                optimized_poses=self.optimized_poses,
                vocab=self.memory.vocab,
                map2d=map2d, opt_cloud=opt_cloud, opt_mesh=opt_mesh,
            )
            self.memory.db.flush()

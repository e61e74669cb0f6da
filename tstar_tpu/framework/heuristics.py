"""Detector backend registry: string name -> scorer factory.

Counterpart of the reference's ``initialize_heuristic``
(``TStar/TStarFramework.py:171-187``: 'owl-vit' -> OWLInterface,
'yolo-World' -> YoloWorldInterface, else NotImplementedError).  A backend
here is an object that, given a device frame cache and the grounded objects,
builds a jittable ``Scorer`` for the search engine — the equivalent of the
reference's ``reparameterize_object_list`` + detector binding
(interface_searcher.py:85-91).

Backends:
  * ``owl-vit``        — Flax OWL-ViT from a local HF checkpoint directory.
  * ``owl-vit-random`` — same architecture, random weights (benchmarks /
                         smoke tests; no checkpoint needed).
  * ``color-probe``    — weight-free detector that scores frames by colored-
                         region matching; the hermetic end-to-end backend for
                         synthetic fixture videos (plays the role the fake
                         LlavaInterface plays for the reference's grounder).
  * ``yolo-world``     — text-conditioned YOLO-class detector from a
                         checkpoint (mmdet/mmyolo .pth via the converter in
                         models/yolo_loader.py, or a native Flax checkpoint).
  * ``yolo-world-random`` — same architecture, random weights.

``owl-vit`` / ``yolo-world`` WITHOUT a checkpoint_dir raise ValueError: the
reference always loads real weights (TStarFramework.py:175-185), so running
random weights must be an explicit opt-in via the ``-random`` names.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Protocol, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tstar_tpu.search.scorers import Scorer, TableScorer
from tstar_tpu.utils.config import SearchConfig

logger = logging.getLogger(__name__)


class HeuristicBackend(Protocol):
    name: str

    def build_scorer(
        self,
        cache: jax.Array,            # (N_pad, ch, cw, 3) uint8
        target_objects: Sequence[str],
        cue_objects: Sequence[str],
        config: SearchConfig,
    ) -> Scorer: ...


class _DetectorCompatMixin:
    """Reference-compatible detector surface (interface_heuristic.py):
    ``reparameterize_object_list`` / ``inference_detector`` /
    ``bbox_visualization`` / ``texts`` — for users porting code that drives
    the detector directly rather than through the search engine."""

    texts: list = []

    def reparameterize_object_list(self, target_objects, cue_objects):
        """Set the text prompts (interface_heuristic.py:78-93,268-280)."""
        combined = list(target_objects) + list(cue_objects)
        self.texts = [[obj.strip()] for obj in combined] + [[" "]]
        self._compat_targets = list(target_objects)
        self._compat_cues = list(cue_objects)

    def inference_detector(self, images, score_threshold: float = 0.005, **kw):
        """Detect on a batch of HWC uint8 images -> list of detection dicts
        {"xyxy", "confidence", "class_id"} (numpy), one per image."""
        import jax.numpy as jnp
        import numpy as np

        from tstar_tpu.kernels.image import bilinear_resize, normalize_clip
        from tstar_tpu.models.owlvit import OwlViTDetector, postprocess_detections

        if not getattr(self, "texts", None):
            raise RuntimeError("call reparameterize_object_list first")
        ids, mask = self.tokenizer.encode_batch([t[0] for t in self.texts])
        queries = self.model.apply(
            self.variables, jnp.asarray(ids), jnp.asarray(mask),
            method=OwlViTDetector.encode_text,
        )
        size = self.model.cfg.vision.image_size
        out = []
        for image in images:
            image = np.asarray(image)
            px = normalize_clip(
                bilinear_resize(jnp.asarray(image), (size, size)),
                self.model.dtype,
            )[None]
            feats = self.model.apply(
                self.variables, px, method=OwlViTDetector.encode_image
            )
            logits, boxes = self.model.apply(
                self.variables, feats, queries, None, method=OwlViTDetector.predict
            )
            scores, cls, xyxy = postprocess_detections(
                logits, boxes, image.shape[:2]
            )
            keep = np.asarray(scores[0]) > score_threshold
            out.append(
                {
                    "xyxy": np.asarray(xyxy[0])[keep],
                    "confidence": np.asarray(scores[0])[keep],
                    "class_id": np.asarray(cls[0])[keep],
                }
            )
        self.detections_inbatch = out
        return out

    def inference(self, image_path: str, score_threshold: float = 0.3, **kw):
        """Path-based single-image detection (interface_heuristic.py:217-230)."""
        from PIL import Image
        import numpy as np

        with Image.open(image_path) as im:
            image = np.asarray(im.convert("RGB"))
        return self.inference_detector([image], score_threshold=score_threshold)[0]

    def bbox_visualization(self, images, detections_inbatch):
        """Annotated copies of the images (interface_heuristic.py:259-267)."""
        from tstar_tpu.viz.boxes import draw_boxes

        out = []
        for image, det in zip(images, detections_inbatch):
            labels = [
                f"{self.texts[c][0]} {s:.2f}"
                for c, s in zip(det["class_id"], det["confidence"])
                if c < len(self.texts)
            ]
            out.append(
                draw_boxes(image, det["xyxy"], labels=labels, class_ids=det["class_id"])
            )
        return out


class OwlVitHeuristic(_DetectorCompatMixin):
    """Flax OWL-ViT backend (reference default, TStarFramework.py:175-179)."""

    def __init__(self, checkpoint_dir: Optional[str] = None, dtype=None,
                 seed: int = 0, model_config=None):
        import jax.numpy as jnp

        from tstar_tpu.models.owlvit import OwlViTDetector, owlvit_base_patch32

        self.name = "owl-vit" if checkpoint_dir else "owl-vit-random"
        dtype = dtype if dtype is not None else jnp.bfloat16
        if checkpoint_dir:
            from tstar_tpu.models.loader import load_owlvit_checkpoint

            self.model, self.variables, self.tokenizer = load_owlvit_checkpoint(
                checkpoint_dir, dtype=dtype
            )
        else:
            from tstar_tpu.models.clip_tokenizer import HashTokenizer

            # model_config: random-init dims override (tiny-dims tests)
            cfg = model_config or owlvit_base_patch32()
            self.model = OwlViTDetector(cfg, dtype=dtype)
            self.variables = self.model.init(
                jax.random.key(seed),
                jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3), dtype),
                jnp.zeros((2, cfg.text.max_length), jnp.int32),
            )
            self.tokenizer = HashTokenizer(
                vocab_size=cfg.text.vocab_size, context=cfg.text.max_length
            )

    def build_scorer(self, cache, target_objects, cue_objects, config):
        from tstar_tpu.search.detector_scorer import make_owlvit_scorer

        return make_owlvit_scorer(
            self.model, self.variables, cache,
            target_objects, cue_objects, self.tokenizer, config,
        )


class CalibratedOwlVitHeuristic(OwlVitHeuristic):
    """OWL-ViT with random frozen weights and CALIBRATED query embeddings.

    Measurement backend for the accuracy-affecting perf knobs
    (``detector_quant`` int8/w8a16, ``verify_image_size``; VERDICT r4
    item 2): zero egress blocks real checkpoints, and the color-probe
    backend bypasses the detector entirely, so neither can measure how
    quantization or reduced-resolution verification perturb DETECTIONS.
    This backend turns the real OWL-ViT compute path into a *functioning*
    detector on the synthetic planted-object fixtures (video/synthetic.py):

      1. render calibration canvases through the production preprocessing
         (``build_detector_grid``) with the object's color square planted
         in known grid cells over background frames;
      2. recover the encoder's per-patch class-space directions through the
         PUBLIC ``predict`` interface by probing with +/- basis queries:
         ``ClassHead`` logits are ``(img_hat . q_hat + shift) * scale`` with
         per-patch positive scale, so the half-difference of the +e_i / -e_i
         probe logits isolates ``img_hat_i * scale(p)`` and the scale
         cancels under normalization;
      3. the query embedding for object X = the CONTRAST direction
         ``normalize(dir(object patch) - dir(background patch))``, averaged
         over calibration cells — at the object the cosine is +m, on
         background -m, a symmetric logit margin;
      4. the ' ' padding prompt is MASKED (its random embedding would
         otherwise compete in the per-patch argmax; documented deviation
         from the reference prompt layout, interface_heuristic.py:268-280);
      5. measured object/background score distributions (grid AND
         verification-style canvases) are exposed via ``calibration`` and
         ``suggested_confidence_threshold`` (their midpoint), so searches
         are well-posed by construction at bf16 and knob configs perturb
         genuine detections.

    A random ViT is a deterministic, color-sensitive feature extractor, so
    this is a real detector in every architectural sense — only the features
    are arbitrary.  NOT a substitute for real-checkpoint validation
    (tests/test_real_checkpoints.py remains that); but knob deltas measured
    here exercise exactly the code paths the knobs change.
    """

    def __init__(
        self,
        color_map: Optional[Dict[str, Tuple[int, int, int]]] = None,
        dtype=None,
        seed: int = 0,
        object_position: Tuple[float, float] = (0.5, 0.45),
        object_size: float = 0.4,
        # (canvas index -> object cells) rotation: global attention makes
        # every patch's logit map context-dependent, so both the object
        # CELLS and the surrounding cell contents must vary across
        # calibration canvases or the separator won't transfer to search
        # canvases (measured: the object's own-patch b-shift even flips
        # sign between uniform and diverse canvases)
        cal_cells_per_canvas: Sequence[Sequence[int]] = (
            (5, 10), (0, 15), (3, 12), (6, 9),
        ),
        model_config=None,
    ):
        super().__init__(checkpoint_dir=None, dtype=dtype, seed=seed,
                         model_config=model_config)
        self.name = "owl-vit-calibrated"
        self.color_map = dict(DEFAULT_COLOR_MAP if color_map is None else color_map)
        self.object_position = object_position
        self.object_size = object_size
        self.cal_cells_per_canvas = tuple(tuple(c) for c in cal_cells_per_canvas)
        self.calibration: Dict[str, Dict[str, float]] = {}
        self._dir_cache: Dict[Tuple, Dict[str, np.ndarray]] = {}

    # -- calibration -------------------------------------------------------
    def _render_cal_frame(self, hw, color=None, t: float = 0.0) -> np.ndarray:
        from tstar_tpu.video.synthetic import PlantedObject, render_frame

        objs = []
        if color is not None:
            objs = [PlantedObject("cal", (0.0, 1e9), color,
                                  self.object_position, self.object_size)]
        return render_frame(t, hw, objs)

    def _patch_index(self, cell: int, config: SearchConfig) -> int:
        """Row-major patch index of the object's center within grid cell."""
        c = self.model.cfg.vision
        rows, cols = config.grid_rows, config.grid_cols
        cell_h, cell_w = c.image_size // rows, c.image_size // cols
        r, col = divmod(cell, cols)
        y = int((r + self.object_position[0]) * cell_h)
        x = int((col + self.object_position[1]) * cell_w)
        n = c.num_patches_side
        return (y // c.patch_size) * n + (x // c.patch_size)

    def _object_patch_span(self, cell, rows, cols, cache_hw):
        """-> (fully-covered patch indices, touched patch indices) of the
        object square rendered in grid cell ``cell``."""
        c = self.model.cfg.vision
        ch, cw = cache_hw
        cell_h, cell_w = c.image_size // rows, c.image_size // cols
        half = max(2, int(self.object_size * min(ch, cw) / 2))
        hy, hx = half * cell_h / ch, half * cell_w / cw
        r, col = divmod(cell, cols)
        cy = (r + self.object_position[0]) * cell_h
        cx = (col + self.object_position[1]) * cell_w
        ps, n = c.patch_size, c.num_patches_side
        import math

        def span(lo, hi):
            return range(math.ceil(lo / ps), math.floor(hi / ps)), range(
                math.floor(lo / ps), math.ceil(hi / ps)
            )

        (fy, ty), (fx, tx) = span(cy - hy, cy + hy), span(cx - hx, cx + hx)
        full = [py * n + px for py in fy for px in fx]
        touched = [py * n + px for py in ty for px in tx]
        if not full:
            # object smaller than a patch: the center patch is the best
            # (majority-covered) positive example available
            full = [int(cy // ps) * n + int(cx // ps)]
        return full, touched

    def _cell_patches(self, cell, rows, cols):
        c = self.model.cfg.vision
        ps, n = c.patch_size, c.num_patches_side
        ph, pw = (c.image_size // rows) // ps, (c.image_size // cols) // ps
        r, col = divmod(cell, cols)
        return [
            (r * ph + py) * n + (col * pw + px)
            for py in range(ph) for px in range(pw)
        ]

    def _probe_affine(self, pixels):
        """(1, S, S, 3) canvas -> per-patch affine logit map (A, b).

        ``ClassHead`` computes ``logit_p(q) = (img_hat_p . q_hat + s_p) c_p``
        with per-patch shift s_p and positive scale c_p.  Probing with the
        +/- basis queries e_i gives logit(+e_i) + logit(-e_i) = 2 s_p c_p and
        logit(+e_i) - logit(-e_i) = 2 img_i c_p, so the patch's logit for ANY
        normalized query is EXACTLY ``A_p . q_hat + b_p`` with
        A_p = img_hat_p c_p (returned raw, scale included) and b_p = s_p c_p.
        """
        from tstar_tpu.models.owlvit import OwlViTDetector

        dq = self.model.cfg.text.hidden_size
        feats = self.model.apply(
            self.variables, pixels, method=OwlViTDetector.encode_image
        )
        probes = jnp.concatenate([jnp.eye(dq), -jnp.eye(dq)]).astype(jnp.float32)
        logits, _ = self.model.apply(
            self.variables, feats, probes, None, method=OwlViTDetector.predict
        )
        lp = np.asarray(logits[0], np.float64)
        a = (lp[:, :dq] - lp[:, dq:]) / 2
        b = (lp[:, :dq] + lp[:, dq:]).mean(-1) / 2
        return a, b

    def _calibrate(self, cache_hw, names, config) -> Dict[str, np.ndarray]:
        from tstar_tpu.kernels.image import build_detector_grid
        from tstar_tpu.models.owlvit import OwlViTDetector, postprocess_detections

        key = (cache_hw, config.grid_rows, config.grid_cols, tuple(sorted(names)))
        if key in self._dir_cache:
            return self._dir_cache[key]

        rows, cols = config.grid_rows, config.grid_cols
        k = rows * cols
        size = self.model.cfg.vision.image_size
        dirs_by_name: Dict[str, np.ndarray] = {}
        for name in names:
            color = self.color_map.get(name)
            if color is None:
                logger.warning("owl-vit-calibrated: no color for %r", name)
                continue
            # Calibration cache: one full background-intensity cycle
            # (second_intensity has period ceil(200/7)=29 s) + the object
            # over every one of those backgrounds.
            npool = 29
            frames = [self._render_cal_frame(cache_hw, None, t)
                      for t in range(npool)]
            frames += [self._render_cal_frame(cache_hw, color, t)
                       for t in range(npool)]
            cal_cache = jnp.asarray(np.stack(frames))

            # -- training data: per-patch affine logit maps with object /
            # background / excluded-mixed labels.  Canvases are DIVERSE like
            # search-time grids (16 different backgrounds per canvas,
            # object cells rotating) — global attention makes every patch
            # context-dependent, so uniform calibration canvases do not
            # transfer.  Verification scale (one frame fills the canvas)
            # trains from its own canvases.
            rng_cal = np.random.default_rng(11)
            rows_x, rows_y = [], []
            canvases = []      # (secs, cells_with_object, grid_rows, grid_cols)
            for cells in self.cal_cells_per_canvas:
                secs_bg = rng_cal.choice(npool, size=k, replace=k > npool
                                         ).astype(np.int32)
                secs_obj = secs_bg.copy()
                for cell in cells:
                    secs_obj[cell] = npool + secs_bg[cell]  # object, same bg
                canvases.append((jnp.asarray(secs_bg), (), rows, cols))
                canvases.append((jnp.asarray(secs_obj), tuple(cells), rows, cols))
            # verification scale: one frame fills the whole canvas (grid 1x1)
            for t in (0, 10, 20):
                canvases.append((jnp.asarray([t]), (), 1, 1))
                canvases.append((jnp.asarray([npool + t]), (0,), 1, 1))

            rows_b = []
            for secs, obj_cells, gr, gc in canvases:
                a, b = self._probe_affine(build_detector_grid(
                    cal_cache, secs, (gr, gc), size, dtype=self.model.dtype,
                ))
                label = np.full(a.shape[0], -1.0)
                drop = np.zeros(a.shape[0], bool)
                for cell in obj_cells:
                    full, touched = self._object_patch_span(
                        cell, gr, gc, cache_hw
                    )
                    drop[touched] = True
                    label[full] = 1.0
                    drop[full] = False
                keep = ~drop
                rows_x.append(a[keep])
                rows_y.append(label[keep])
                rows_b.append(b[keep])

            a = np.concatenate(rows_x)
            y = np.concatenate(rows_y)
            b = np.concatenate(rows_b)
            # Ridge in LOGIT space: the patch logit is A_p . q_hat + b_p.
            # Measured structure (full dims): b is near-CONSTANT across
            # background patches (sigma ~ 0.01) but the OBJECT shifts its own
            # patch's b by O(1) — so target a +/-gamma logit separation
            # RELATIVE to b (target A.q = median(b) - b + gamma*y): the
            # object's own b-boost adds to the margin instead of being
            # cancelled, and rare hot-b background patches get compensated.
            # Object patches are rare: weight them up so this is a
            # separator, not a background regressor.
            gamma = 1.5
            b_med = float(np.median(b))
            w = np.where(y > 0, (y <= 0).sum() / max((y > 0).sum(), 1), 1.0)

            def solve(w):
                # ClassHead NORMALIZES the query, so the logits the search
                # sees are A . (q/|q|) + b — a free-norm ridge solution's
                # b-compensation would be scaled away by 1/|q|.  Solve the
                # trust-region problem (min weighted LS s.t. |q| = 1) by
                # bisecting the ridge multiplier: |q(lam)| is monotone
                # decreasing, so pick lam with |q(lam)| = 1.
                aw = a * w[:, None]
                m = aw.T @ a
                r = aw.T @ (b_med - b + gamma * y)
                evals, vecs = np.linalg.eigh(m)
                rv = vecs.T @ r

                def qnorm(lam):
                    return float(np.sqrt(((rv / (evals + lam)) ** 2).sum()))

                lo = 1e-9 * max(float(evals.max()), 1.0)
                if qnorm(lo) <= 1.0:
                    lam = lo
                else:
                    hi = 1e6 * max(float(evals.max()), 1.0)
                    for _ in range(60):
                        mid = np.sqrt(lo * hi)
                        if qnorm(mid) > 1.0:
                            lo = mid
                        else:
                            hi = mid
                    lam = np.sqrt(lo * hi)
                q = vecs @ (rv / (evals + lam))
                return q / (np.linalg.norm(q) + 1e-9)

            # Hard-negative reweighting: the splat/verify consume the MAX
            # over a cell's patches, so one hot background outlier costs a
            # whole cell — boost misordered rows and re-solve (2 rounds
            # measured enough to clear the grid margin on the fixtures).
            q = solve(w)
            for _ in range(2):
                logit = a @ q + b
                tau = (logit[y > 0].min() + logit[y < 0].max()) / 2
                viol = ((y < 0) & (logit > tau)) | ((y > 0) & (logit < tau))
                if not viol.any():
                    break
                w = np.where(viol, w * 8.0, w)
                q = solve(w)
            dirs_by_name[name] = q.astype(np.float32)

            # -- margin measurement with the FINAL query, scored the way the
            # splat sees it (per-cell max over patches) --------------------
            qj = jnp.asarray(dirs_by_name[name])[None]
            stats = {"grid": {"obj": [], "bg": []},
                     "verify": {"obj": [], "bg": []}}
            for secs, obj_cells, gr, gc in canvases:
                pixels = build_detector_grid(
                    cal_cache, secs, (gr, gc), size, dtype=self.model.dtype
                )
                feats = self.model.apply(
                    self.variables, pixels, method=OwlViTDetector.encode_image
                )
                logits, boxes = self.model.apply(
                    self.variables, feats, qj, None,
                    method=OwlViTDetector.predict,
                )
                scores, _, _ = postprocess_detections(logits, boxes, (size, size))
                s = np.asarray(scores[0])
                scale = "grid" if gr > 1 else "verify"
                for cell in range(gr * gc):
                    cell_max = float(s[self._cell_patches(cell, gr, gc)].max())
                    stats[scale]["obj" if cell in obj_cells else "bg"].append(
                        cell_max
                    )
            self.calibration[name] = {
                "grid_obj_min": min(stats["grid"]["obj"]),
                "grid_bg_max": max(stats["grid"]["bg"]),
                "verify_obj_min": min(stats["verify"]["obj"]),
                "verify_bg_max": max(stats["verify"]["bg"]),
            }
            self.calibration[name]["grid_margin"] = (
                self.calibration[name]["grid_obj_min"]
                - self.calibration[name]["grid_bg_max"]
            )
            self.calibration[name]["verify_margin"] = (
                self.calibration[name]["verify_obj_min"]
                - self.calibration[name]["verify_bg_max"]
            )
        self._dir_cache[key] = dirs_by_name
        return dirs_by_name

    def calibrate(self, cache_hw, target_objects, cue_objects, config):
        """Public pre-calibration: run it BEFORE constructing the searcher so
        ``suggested_detector_threshold`` / ``suggested_confidence_threshold``
        can seed the SearchConfig (build_scorer reuses the cached result).
        Returns the measured per-object calibration stats."""
        names = list(target_objects) + list(cue_objects)
        self._calibrate(tuple(int(d) for d in cache_hw), names, config)
        return self.calibration

    def _suggest(self, scale: str) -> float:
        stats = list(self.calibration.values())
        if not stats:
            raise RuntimeError("calibrate first (build_scorer)")
        lo = min(s[f"{scale}_obj_min"] for s in stats)
        hi = max(s[f"{scale}_bg_max"] for s in stats)
        return float((lo + hi) / 2)

    @property
    def suggested_confidence_threshold(self) -> float:
        """Midpoint of the measured verification-scale score gap (gates
        ``verify_and_remove_target``)."""
        return self._suggest("verify")

    @property
    def suggested_detector_threshold(self) -> float:
        """Midpoint of the measured grid-scale score gap (gates which
        detections splat/trigger verification)."""
        return self._suggest("grid")

    def build_scorer(self, cache, target_objects, cue_objects, config):
        import dataclasses

        base = super().build_scorer(cache, target_objects, cue_objects, config)
        names = list(target_objects) + list(cue_objects)
        dirs = self._calibrate(
            tuple(int(d) for d in cache.shape[1:3]), names, config
        )
        q = np.zeros(base.query_embeds.shape, np.float32)
        mask = np.zeros(base.query_mask.shape, bool)
        for i, n in enumerate(names):
            if n in dirs:
                q[i] = dirs[n]
                mask[i] = True
        return dataclasses.replace(
            base,
            query_embeds=jnp.asarray(q, base.query_embeds.dtype),
            query_mask=jnp.asarray(mask),
        )


# Default palette for synthetic fixtures (video/synthetic.py default_scene).
DEFAULT_COLOR_MAP: Dict[str, Tuple[int, int, int]] = {
    "couch": (200, 40, 40),
    "tv": (40, 40, 200),
    "chair": (40, 200, 40),
    "table": (200, 200, 40),
    "person": (200, 40, 200),
    "lamp": (40, 200, 200),
}


class ColorProbeHeuristic:
    """Weight-free detector: confidence = colored-region coverage per frame.

    For each object name with a known color, a frame's confidence is the
    fraction of pixels within tolerance of that color, scaled into a
    detector-like confidence.  Produces per-second tables consumed via
    ``TableScorer`` so the search runs exactly as with a real detector.
    """

    def __init__(
        self,
        color_map: Optional[Dict[str, Tuple[int, int, int]]] = None,
        tolerance: float = 40.0,
        gain: float = 30.0,
        presence_threshold: float = 0.05,
    ):
        self.name = "color-probe"
        self.color_map = dict(DEFAULT_COLOR_MAP if color_map is None else color_map)
        self.tolerance = tolerance
        self.gain = gain
        self.presence_threshold = presence_threshold

    def build_scorer(self, cache, target_objects, cue_objects, config):
        names = list(target_objects) + list(cue_objects)
        q = config.max_objects
        colors = np.zeros((q, 3), np.float32)
        active = np.zeros((q,), bool)
        for i, n in enumerate(names):
            if n in self.color_map:
                colors[i] = self.color_map[n]
                active[i] = True
            else:
                logger.warning("color-probe: no color registered for %r", n)
        weights = np.full((q,), config.cue_weight, np.float32)
        weights[: len(target_objects)] = config.target_weight

        colors_j = jnp.asarray(colors)

        def per_frame(frame):  # (h, w, 3) uint8 -> (Q,) coverage
            d = jnp.linalg.norm(
                frame.astype(jnp.float32)[:, :, None, :] - colors_j[None, None],
                axis=-1,
            )
            return jnp.mean((d < self.tolerance).astype(jnp.float32), axis=(0, 1))

        # Chunked map keeps peak memory at (chunk, h, w, Q) instead of
        # materializing the full (N, h, w, Q) distance tensor.
        coverage = jax.lax.map(per_frame, cache, batch_size=32)  # (N, Q)
        raw_conf = jnp.clip(coverage * self.gain, 0.0, 1.0) * jnp.asarray(active)
        presence = raw_conf > self.presence_threshold  # (N, Q)
        weighted = raw_conf * jnp.asarray(weights)[None]
        conf = jnp.max(
            jnp.where(presence, weighted, 0.0), axis=-1
        )  # cell-max of weighted confidences, like the splat
        return TableScorer(
            grid_conf=conf,
            grid_presence=presence,
            verify_conf=conf,
            verify_presence=presence,
        )


def initialize_heuristic(
    heuristic_type: str = "owl-vit", **kwargs
) -> HeuristicBackend:
    """String dispatch, extending TStarFramework.py:171-187."""
    name = heuristic_type.lower()
    if name in ("owl-vit", "owlv2", "owl-v2"):
        # OWLv2 checkpoints load through the same backend (models/owlvit.py
        # converter auto-detects the owlv2. prefix).
        ckpt = kwargs.get("checkpoint_dir")
        if not ckpt:
            # The reference always loads real weights here
            # (TStarFramework.py:175-179, from_pretrained); silently running
            # random weights would return garbage keyframes with no error.
            raise ValueError(
                "initialize_heuristic('owl-vit') requires checkpoint_dir= "
                "(a local HF OWL-ViT checkpoint directory). For benchmarks/"
                "smoke tests that don't need real weights, ask explicitly "
                "for initialize_heuristic('owl-vit-random')."
            )
        return OwlVitHeuristic(checkpoint_dir=ckpt)
    if name == "owl-vit-random":
        return OwlVitHeuristic(checkpoint_dir=None, seed=kwargs.get("seed", 0))
    if name == "owl-vit-calibrated":
        # Functioning random-weight detector for knob-recall measurement
        # (scripts/ab_knob_recall.py); see the class docstring.
        return CalibratedOwlVitHeuristic(
            color_map=kwargs.get("color_map"), seed=kwargs.get("seed", 0)
        )
    if name in ("color-probe", "fake"):
        return ColorProbeHeuristic(color_map=kwargs.get("color_map"))
    if name in ("yolo-world", "yolo-world-v2"):
        ckpt = kwargs.get("checkpoint_dir")
        if not ckpt:
            # Same loud-failure contract as owl-vit: the reference's
            # yolo-World branch always loads a checkpoint
            # (TStarFramework.py:180-185, init_detector(cfg, ckpt)).
            raise ValueError(
                "initialize_heuristic('yolo-world') requires checkpoint_dir= "
                "(an mmdet/mmyolo YOLO-World .pth or a native Flax "
                "checkpoint directory). For random-weight runs ask "
                "explicitly for initialize_heuristic('yolo-world-random')."
            )
        return YoloWorldHeuristic(
            checkpoint_dir=ckpt,
            size=kwargs.get("size", "xl"),
            seed=kwargs.get("seed", 0),
        )
    if name == "yolo-world-random":
        return YoloWorldHeuristic(
            checkpoint_dir=None,
            size=kwargs.get("size", "xl"),
            seed=kwargs.get("seed", 0),
        )
    raise NotImplementedError(f"Heuristic type '{heuristic_type}' is not implemented.")


class YoloWorldHeuristic(_DetectorCompatMixin):
    """YOLO-World v2 backend (reference TStarFramework.py:180-185).

    ``checkpoint_dir`` may contain either
      * an mmdet/mmyolo YOLO-World ``.pth`` (the reference's checkpoint
        format, e.g. ``yolo_world_v2_xl_obj365v1_goldg_cc3mlite_pretrain-
        5daf1395.pth``) plus CLIP tokenizer files (vocab.json/merges.txt) —
        converted tensor-for-tensor by models/yolo_loader.py; or
      * native Flax checkpoints (models/loader.save_flax_params format).
    Random init (the explicit ``yolo-world-random`` name) serves benchmarks
    and interface tests.
    """

    def __init__(self, checkpoint_dir: Optional[str] = None, size: str = "xl", seed: int = 0):
        import jax as _jax
        import jax.numpy as jnp

        from tstar_tpu.models.clip_tokenizer import HashTokenizer
        from tstar_tpu.models.owlvit import TextConfig
        from tstar_tpu.models.yoloworld import (
            YoloTextEncoder,
            YoloWorldDetector,
            yoloworld_small,
            yoloworld_xl,
        )

        self.name = "yolo-world"
        if size not in ("xl", "small"):
            raise ValueError(f"unknown yolo-world size {size!r}; choose xl | small")
        if checkpoint_dir:
            from tstar_tpu.models.yolo_loader import load_yolo_world_checkpoint

            (self.model, self.variables, self.text_model, self.text_variables,
             self.tokenizer) = load_yolo_world_checkpoint(
                checkpoint_dir, size=size, dtype=jnp.bfloat16
            )
        else:
            cfg = yoloworld_small() if size == "small" else yoloworld_xl()
            # CLIP-base text tower at the model's text width (the real tower
            # is hidden 512 / proj 512; tiny dims for the small variant).
            text_cfg = TextConfig(
                hidden_size=cfg.text_dim,
                num_layers=2 if size == "small" else 12,
                num_heads=4 if size == "small" else 8,
                intermediate_size=4 * cfg.text_dim,
            )
            self.model = YoloWorldDetector(cfg, dtype=jnp.bfloat16)
            self.text_model = YoloTextEncoder(
                text_cfg, projection_dim=cfg.text_dim, dtype=jnp.bfloat16
            )
            size_px = cfg.image_size
            self.variables = self.model.init(
                _jax.random.key(seed),
                jnp.zeros((1, size_px, size_px, 3), jnp.bfloat16),
                jnp.zeros((2, cfg.text_dim), jnp.bfloat16),
            )
            self.text_variables = self.text_model.init(
                _jax.random.key(seed + 1),
                jnp.zeros((2, text_cfg.max_length), jnp.int32),
                jnp.ones((2, text_cfg.max_length), jnp.int32),
            )
            self.tokenizer = HashTokenizer(
                vocab_size=text_cfg.vocab_size, context=text_cfg.max_length
            )

    def build_scorer(self, cache, target_objects, cue_objects, config):
        import jax.numpy as jnp

        from tstar_tpu.search.detector_scorer import build_prompt_batch
        from tstar_tpu.search.yolo_scorer import YoloWorldScorer

        ids_pad, mask_pad, weights = build_prompt_batch(
            target_objects, cue_objects, self.tokenizer, config
        )
        # YoloTextEncoder already projects + L2-normalizes
        # (HuggingCLIPLanguageBackbone.forward_text).
        text_embeds = self.text_model.apply(
            self.text_variables, jnp.asarray(ids_pad), jnp.asarray(mask_pad)
        )
        return YoloWorldScorer(
            cache=cache,
            variables=self.variables,
            text_embeds=text_embeds.astype(jnp.float32),
            query_mask=jnp.asarray(ids_pad[:, 0] > 0),
            class_weights=jnp.asarray(weights),
            model=self.model,
            config=config,
        )

    # -- reference-compatible detector surface: reparameterize_object_list
    # and bbox_visualization come from _DetectorCompatMixin; only the
    # detection forward differs from the OWL backend. ----------------------
    def _encode_texts(self):
        import jax.numpy as jnp

        if not getattr(self, "texts", None):
            raise RuntimeError("call reparameterize_object_list first")
        ids, mask = self.tokenizer.encode_batch([t[0] for t in self.texts])
        return self.text_model.apply(
            self.text_variables, jnp.asarray(ids), jnp.asarray(mask)
        )

    def inference_detector(self, images, score_threshold: float = 0.12,
                           max_dets: int = 50, **kw):
        """Batch detection -> list of {"xyxy", "confidence", "class_id"}
        (reference search-path defaults: threshold 0.12, max 50,
        interface_heuristic.py:136-168)."""
        import jax.numpy as jnp
        import numpy as np

        from tstar_tpu.kernels.image import bilinear_resize
        from tstar_tpu.models.yoloworld import postprocess_yolo

        text_embeds = self._encode_texts()
        size = self.model.cfg.image_size
        out = []
        for image in images:
            image = np.asarray(image)
            px = (bilinear_resize(jnp.asarray(image), (size, size)) / 255.0)[None]
            logits, boxes = self.model.apply(
                self.variables, px.astype(self.model.dtype), text_embeds
            )
            scores, cls, xyxy, keep = postprocess_yolo(
                logits, boxes, None, score_threshold=score_threshold,
                nms_iou=self.model.cfg.nms_iou, max_dets=max_dets,
            )
            k = np.asarray(keep[0])
            # detector coords are on the size x size canvas; map back and
            # clip to the image (mmdet clamps boxes in _bbox_post_process)
            h, w = image.shape[:2]
            scale = np.asarray([w / size, h / size, w / size, h / size])
            boxes_img = np.clip(
                np.asarray(xyxy[0])[k] * scale,
                0.0, np.asarray([w, h, w, h], np.float64),
            )
            out.append({
                "xyxy": boxes_img,
                "confidence": np.asarray(scores[0])[k],
                "class_id": np.asarray(cls[0])[k],
            })
        self.detections_inbatch = out
        return out

    def inference(self, image_path: str, score_threshold: float = 0.3,
                  max_dets: int = 100, **kw):
        """Path-based single-image detection (reference defaults 0.3/100,
        interface_heuristic.py:96-134)."""
        import numpy as np
        from PIL import Image

        with Image.open(image_path) as im:
            image = np.asarray(im.convert("RGB"))
        return self.inference_detector(
            [image], score_threshold=score_threshold, max_dets=max_dets
        )[0]

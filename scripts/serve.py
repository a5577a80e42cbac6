"""Story-serving daemon: HTTP front-end over StoryGenPipeline.

The reference has no serving layer (SURVEY.md §1: "no server/serving
layer, no RPC layer"); production use means hand-driving inference.py.
This daemon turns a checkpoint into a service:

    python scripts/serve.py --ckpt /path/to/ckpt --port 8500

    POST /story    {"prompts": ["...", ...], "num_inference_steps": 50,
                    "guidance_scale": 7.0, "image_guidance_scale": 3.5,
                    "sampler": "ddim", "seed": 0}
                -> {"frames": [<base64 PNG>, ...], "latency_s": ...}
    GET  /healthz  -> {"ok": true, "devices": N}

Design notes (TPU serving):
- one process owns the chip(s); requests serialize through a lock — the
  sampler already saturates a chip at story-batch 1 (BENCH.md "Batched
  serving"), so intra-chip request batching buys nothing. Scale-out =
  run one daemon per slice behind any HTTP balancer, or use
  parallel/serving.sample_data_parallel for offline batch jobs.
- first request per (shape, step-count, ref-count) pays the jit compile;
  the persistent .jax_cache makes restarts warm.
- stdlib-only (http.server): no web framework dependency.
"""
import argparse
import base64
import io
import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALLOWED_KEYS = {
    "prompts", "num_inference_steps", "height", "width", "guidance_scale",
    "image_guidance_scale", "sampler", "seed", "max_refs", "normalize_refs",
    "reuse_latents", "fused",
}


class StoryService:
    """Wraps a StoryGenPipeline with request validation + serialization.

    Separated from the HTTP layer so tests can drive it in-process with
    tiny CPU models.
    """

    def __init__(self, pipe):
        self.pipe = pipe
        self._lock = threading.Lock()  # one sampler run at a time

    def handle_story(self, req: dict) -> dict:
        import jax
        import numpy as np
        from PIL import Image

        unknown = set(req) - ALLOWED_KEYS
        if unknown:
            raise ValueError(f"unknown fields: {sorted(unknown)}")
        prompts = req.get("prompts")
        if (not isinstance(prompts, list) or not prompts
                or not all(isinstance(p, str) for p in prompts)):
            raise ValueError("'prompts' must be a non-empty list of strings")
        kw = {}
        for k in ("num_inference_steps", "height", "width"):
            if k in req:
                kw[k] = int(req[k])
        for k in ("guidance_scale", "image_guidance_scale"):
            if k in req:
                kw[k] = float(req[k])
        if "sampler" in req:
            kw["sampler"] = str(req["sampler"])
        if "seed" in req:
            kw["rng"] = jax.random.PRNGKey(int(req["seed"]))
        gen_kw = {}
        if "max_refs" in req:
            gen_kw["max_refs"] = int(req["max_refs"])
        if "normalize_refs" in req:
            gen_kw["normalize_refs"] = bool(req["normalize_refs"])
        if "reuse_latents" in req:
            gen_kw["reuse_latents"] = bool(req["reuse_latents"])
        if "fused" in req:
            # one jitted program per story (one dispatch; float32-
            # roundoff-equal frames) — best serving latency once the
            # program is compile-cached
            gen_kw["fused"] = bool(req["fused"])

        t0 = time.perf_counter()
        with self._lock:
            frames = self.pipe.generate_story(prompts, **gen_kw, **kw)
        dt = time.perf_counter() - t0

        out = []
        for f in frames:
            img = Image.fromarray(
                (np.clip(np.asarray(f), 0, 1) * 255).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            out.append(base64.b64encode(buf.getvalue()).decode("ascii"))
        return {"frames": out, "latency_s": round(dt, 3)}


def make_handler(service: StoryService):
    class Handler(BaseHTTPRequestHandler):
        server_version = "StoryGenTPU"

        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax
                self._reply(200, {"ok": True,
                                  "devices": jax.device_count()})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/story":
                self._reply(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                self._reply(200, service.handle_story(req))
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # surface, don't kill the server
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):
            print(f"[serve] {self.address_string()} {fmt % args}",
                  file=sys.stderr)

    return Handler


def serve(pipe, host: str, port: int) -> ThreadingHTTPServer:
    """Build (and return) the server; caller runs serve_forever()."""
    return ThreadingHTTPServer((host, port), make_handler(StoryService(pipe)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="diffusers-layout checkpoint folder")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8500)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel degree: shard the UNet over a "
                         "(data, tensor) mesh (parallel/tensor.py) to cut "
                         "single-story latency on a multi-chip host. "
                         "Correctness-tested on the virtual CPU mesh; "
                         "latency benefit UNMEASURED on real multi-chip "
                         "(single-chip bench sandbox, BENCH.md).")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from storygen_tpu.checkpoint.hf_import import load_diffusers_pretrained
    from storygen_tpu.data.loader import Tokenizer
    from storygen_tpu.pipeline import StoryGenPipeline

    b = load_diffusers_pretrained(args.ckpt, dtype=jnp.bfloat16)
    if args.tp > 1:
        from storygen_tpu.parallel import tensor as T
        n = len(jax.devices())
        assert n % args.tp == 0, (n, args.tp)
        mesh = T.make_tp_mesh(n // args.tp, args.tp)
        b["unet_params"] = T.shard_unet_params(b["unet_params"], mesh)
        b["vae_params"], b["text_params"] = T.replicated_on(
            mesh, (b["vae_params"], b["text_params"]))
        print(f"[serve] tp={args.tp} over {n} devices "
              f"(mesh {dict(mesh.shape)})", file=sys.stderr)
    tok_dir = os.path.join(args.ckpt, "tokenizer")
    pipe = StoryGenPipeline(
        b["unet"], b["unet_params"], b["vae"], b["vae_params"],
        b["text_encoder"], b["text_params"], Tokenizer(tok_dir),
        b.get("scheduler_config"))
    srv = serve(pipe, args.host, args.port)
    print(f"serving on http://{args.host}:{args.port}", file=sys.stderr)
    srv.serve_forever()


if __name__ == "__main__":
    main()

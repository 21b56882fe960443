"""NN close-set refinement A/B on cove 256^2: centroid-only vs --classifier nn,
equal spp, same 4096-spp PT reference. Writes /tmp/nn_ab.json."""
import json, subprocess, sys

common = ["python", "-m", "spcbpt_tpu.apps.benchmark",
          "--scene", "interior_cove", "--dim", "256x256",
          "--ref-npz", "/root/repo/.jax_cache/cove_ref256_ts.npz",
          # explicit ref protocol: /tmp caches may have been wiped, in which
          # case the first arm regenerates the ref (resumable chunks)
          "--ref-alg", "pt", "--ref-spp", "4096", "--ref-chunk", "256",
          "--spp", "48", "--algs", "spcbpt", "--repeats", "3",
          "--train-samples", "400000"]
out = {}
for name, extra in (
        ("centroid", ["--checkpoint", "/root/repo/.jax_cache/cove_ck256_v2.npz",
                      "--json", "/tmp/nn_ab_centroid.json"]),
        ("nn", ["--classifier", "nn",
                "--checkpoint", "/root/repo/.jax_cache/cove_ck256_nn.npz",
                "--json", "/tmp/nn_ab_nn.json"])):
    print(f"[ab] {name} ...", flush=True)
    # stream output (the queue watchdog kills log-quiet jobs)
    r = subprocess.run(common + extra, cwd="/root/repo", timeout=5400)
    if r.returncode != 0:
        sys.exit(r.returncode)
    out[name] = json.load(open(extra[-1]))["algs"]["spcbpt"]
json.dump(out, open("/tmp/nn_ab.json", "w"), indent=2)
print(json.dumps(out))

"""NN close-set refinement A/B on cove 256^2: centroid-only vs --classifier nn,
equal spp, same 4096-spp PT reference. Writes /tmp/nn_ab.json."""
import json, subprocess, sys

common = ["python", "-m", "spcbpt_tpu.apps.benchmark",
          "--scene", "interior_cove", "--dim", "256x256",
          "--ref-npz", "/tmp/cove_ref256_ts.npz",
          "--spp", "48", "--algs", "spcbpt", "--repeats", "3",
          "--train-samples", "400000"]
out = {}
for name, extra in (
        ("centroid", ["--checkpoint", "/tmp/cove_ck256_v2.npz",
                      "--json", "/tmp/nn_ab_centroid.json"]),
        ("nn", ["--classifier", "nn",
                "--checkpoint", "/tmp/cove_ck256_nn.npz",
                "--json", "/tmp/nn_ab_nn.json"])):
    print(f"[ab] {name} ...", flush=True)
    r = subprocess.run(common + extra, cwd="/root/repo",
                       capture_output=True, text=True, timeout=3000)
    sys.stdout.write(r.stdout[-2000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(r.returncode)
    out[name] = json.load(open(extra[-1]))["algs"]["spcbpt"]
json.dump(out, open("/tmp/nn_ab.json", "w"), indent=2)
print(json.dumps(out))

import json, urllib.request, numpy as np, wave, io
from concurrent.futures import ThreadPoolExecutor

def post():
    body = (0.05*np.random.default_rng(0).standard_normal(16000*3)).astype(np.float32).tobytes()
    req = urllib.request.Request("http://127.0.0.1:8731/transcribe", data=body,
                                 headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.load(r)

with urllib.request.urlopen("http://127.0.0.1:8731/healthz") as r:
    print("healthz:", json.load(r))
with ThreadPoolExecutor(4) as pool:
    res = [f.result() for f in [pool.submit(post) for _ in range(4)]]
print("responses:", [type(r["text"]) for r in res], "segments:", [len(r["segments"]) for r in res])
with urllib.request.urlopen("http://127.0.0.1:8731/statz") as r:
    print("statz:", json.load(r))

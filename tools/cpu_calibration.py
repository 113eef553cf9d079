# fixed-work pure-CPU calibration: N pinned python processes each do the
# SAME integer workload; prints per-process wall time. No Spark, no I/O.
import os, sys, time, subprocess, json

def work():
    t0 = time.time()
    x = 0
    for i in range(40_000_000):
        x = (x * 1103515245 + 12345 + i) & 0xFFFFFFFF
    return time.time() - t0

if len(sys.argv) > 1 and sys.argv[1] == "child":
    print(json.dumps({"sec": round(work(), 2)}))
    sys.exit(0)

for n in (1, 2, 4, 8):
    procs = []
    for i in range(n):
        procs.append(subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, __file__, "child"],
            stdout=subprocess.PIPE, text=True))
    secs = [json.loads(p.communicate()[0])["sec"] for p in procs]
    print(json.dumps({"n_active": n, "per_proc_sec": secs,
                      "mean": round(sum(secs)/n, 2)}), flush=True)

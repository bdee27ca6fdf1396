import json, sys
sys.path.insert(0, "/root/repo")
sys.argv = ["bench"]
import jax
jax.config.update("jax_platforms", "axon")
import bench
print(json.dumps(bench.bench_raster_frame()), flush=True)

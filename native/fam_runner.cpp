// fam_runner — native host driver binary for the TPU flash-attention
// framework.
//
// Role parity with the reference's single-binary Obj-C++ host program
// (`main.mm`): there, a native executable acquires the device
// (main.mm:41), runtime-compiles the kernel source as *data*
// (main.mm:52-67), then drives verification and benchmarking and emits
// CSV (main.mm:231-1207).  Here the same split holds on TPU terms: the
// kernels are Pallas/Mosaic programs traced and compiled at runtime, and
// this native binary owns the host process — it embeds CPython, brings
// up JAX/the TPU plugin, runs the verification ladder and the benchmark
// harness in-process, and returns a meaningful exit code.
//
//   fam_runner verify            # 16-rung ladder, exit 0 iff ALL PASS
//   fam_runner bench [--quick]   # N-sweep + high-occupancy, writes CSV
//   fam_runner all [--quick]     # both (the reference binary's flow)
//
// Build: `make -C native runner` -> native/fam_runner.
// The Python-side harness stays importable on its own; this binary is
// the native entry point for environments that want a single executable
// (CI, perf bots) — exactly the reference's `make && ./flash_attn` UX
// (README.md:56-68).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdio>
#include <cstring>
#include <string>

namespace {

int run_python(const std::string& code) {
  // PyRun_SimpleString returns 0 on success, -1 if an exception escaped
  // (the traceback has already been printed to stderr).
  return PyRun_SimpleString(code.c_str()) == 0 ? 0 : 1;
}

const char kVerify[] = R"PY(
import os, sys
sys.path.insert(0, os.getcwd())
from flash_attention_metal_tpu.utils.comp_cache import enable_compilation_cache
enable_compilation_cache()
import jax
from flash_attention_metal_tpu.harness.verify import run_ladder
print("== fam_runner: verification ladder ==", flush=True)
print(f"backend: {jax.default_backend()}", flush=True)
results = run_ladder()
ok = all(r.passed for r in results)
print(f"== {'ALL PASS' if ok else 'FAILURES PRESENT'} "
      f"({sum(r.passed for r in results)}/{len(results)}) ==", flush=True)
if not ok:
    raise SystemExit("ladder failure")
)PY";

const char kBenchFull[] = R"PY(
import os, sys
sys.path.insert(0, os.getcwd())
sys.argv = ["fam_runner-bench"]
from flash_attention_metal_tpu.harness.benchmark import main as bench_main
raise SystemExit(bench_main())
)PY";

const char kBenchQuick[] = R"PY(
import os, sys
sys.path.insert(0, os.getcwd())
sys.argv = ["fam_runner-bench", "--quick"]
from flash_attention_metal_tpu.harness.benchmark import main as bench_main
raise SystemExit(bench_main())
)PY";

void usage(const char* argv0) {
  std::fprintf(stderr,
               "usage: %s <verify|bench|all> [--quick]\n"
               "  verify  run the 16-rung verification ladder\n"
               "  bench   run the N-sweep benchmark + CSV\n"
               "  all     verify then bench (reference main.mm flow)\n",
               argv0);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    usage(argv[0]);
    return 2;
  }
  const std::string mode = argv[1];
  bool quick = false;
  for (int i = 2; i < argc; ++i) {
    if (std::strcmp(argv[i], "--quick") == 0) quick = true;
  }
  if (mode != "verify" && mode != "bench" && mode != "all") {
    usage(argv[0]);
    return 2;
  }

  // Embed CPython; config inherits PYTHONPATH etc. so the package and
  // the TPU plugin resolve exactly as they do for `python -m ...`.
  PyConfig config;
  PyConfig_InitPythonConfig(&config);
  PyStatus status = Py_InitializeFromConfig(&config);
  PyConfig_Clear(&config);
  if (PyStatus_Exception(status)) {
    std::fprintf(stderr, "fam_runner: CPython init failed\n");
    return 1;
  }

  int rc = 0;
  if (mode == "verify" || mode == "all") {
    rc = run_python(kVerify);
  }
  if (rc == 0 && (mode == "bench" || mode == "all")) {
    // SystemExit(0) from bench_main is swallowed by PyRun_SimpleString
    // as success; non-zero raises and returns -1.
    rc = run_python(quick ? kBenchQuick : kBenchFull);
  }

  if (Py_FinalizeEx() < 0 && rc == 0) rc = 1;
  return rc;
}

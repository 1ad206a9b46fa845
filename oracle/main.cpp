// Parity-oracle CLI around the reference library (compiled in place from
// /root/reference with the mex.h / fftw3.h shims in oracle/shim — no
// reference sources are copied into this repo).
//
// Usage:
//   oracle <iref.f64> <imov.f64> <out_motion.f64> <out_warped.f64>
//          <nx> <ny> <nscales> <nrefine> <reg> <nparams> <p...> <niter...>
//
// Raw files are double arrays in the reference's flat layout (x-fastest:
// flat[i + j*nx]); the motion output is the x-plane then the y-plane,
// matching Motion::copy_motion_to_input (src/Motion.cpp:23-39).

#include <cstdio>
#include <cstdlib>
#include <stdexcept>
#include <string>
#include <vector>

#include <src/coord2d.h>
#include <src/Image.h>
#include <src/Motion.h>
#include <src/ImageRegistrationOpticalFlow.h>
#include <src/ImageRegistrationDemons.h>
#include <src/ImageRegistrationFluid.h>
#include <src/SolverOptions.h>

static std::vector<double> read_raw(const char* path, size_t n) {
    FILE* f = std::fopen(path, "rb");
    if (!f) throw std::runtime_error(std::string("cannot open ") + path);
    std::vector<double> v(n);
    if (std::fread(v.data(), sizeof(double), n, f) != n) {
        std::fclose(f);
        throw std::runtime_error(std::string("short read from ") + path);
    }
    std::fclose(f);
    return v;
}

static void write_raw(const char* path, const std::vector<double>& v) {
    FILE* f = std::fopen(path, "wb");
    if (!f) throw std::runtime_error(std::string("cannot open ") + path);
    std::fwrite(v.data(), sizeof(double), v.size(), f);
    std::fclose(f);
}

#include <chrono>
#include <cstring>
#include <src/regularization/OpticalFlow/OpticalFlowDiffusion.h>
#include <src/regularization/OpticalFlow/OpticalFlowCurvature.h>
#include <src/regularization/OpticalFlow/OpticalFlowElastic.h>
#include <src/regularization/OpticalFlow/OpticalFlowFluid.h>
#include <src/regularization/Demons/DemonsThirions.h>
#include <src/regularization/Demons/DemonsDiffeomorphic.h>

// Kernel benchmark mode: time `iters` raw get_update calls on a synthetic
// pair (no pyramid, no convergence gate) — the single-core CPU baseline for
// the Mpixels/s solver-throughput metric (BASELINE.md).
// usage: oracle bench <nx> <ny> <iters> [solver]
//   solver: diffusion (default) | curvature | elastic | fluid |
//           thirions | diffeo
static int bench_main(int argc, char** argv) {
    if (argc != 5 && argc != 6) {
        std::fprintf(stderr, "usage: %s bench nx ny iters [solver]\n", argv[0]);
        return 2;
    }
    const int nx = std::atoi(argv[2]);
    const int ny = std::atoi(argv[3]);
    const int iters = std::atoi(argv[4]);
    const char* name = argc == 6 ? argv[5] : "diffusion";
    const dim dimin((unsigned)nx, (unsigned)ny);
    const size_t size = (size_t)nx * ny;

    std::vector<double> a(size), b(size);
    for (int j = 0; j < ny; j++) {
        for (int i = 0; i < nx; i++) {
            double v = std::sin(0.11 * i) * std::cos(0.07 * j);
            a[i + (size_t)j * nx] = v;
            b[i + (size_t)j * nx] = std::sin(0.11 * (i - 1.3)) * std::cos(0.07 * (j + 0.6));
        }
    }
    Image Iref(dimin), Imov(dimin);
    Iref.set_image(a.data());
    Imov.set_image(b.data());

    IterativeSolver* solver = NULL;
    bool demons = false;
    if (std::strcmp(name, "diffusion") == 0) {
        solver = new OpticalFlowDiffusion(dimin, 0.5f);
    } else if (std::strcmp(name, "curvature") == 0) {
        solver = new OpticalFlowCurvature(dimin, 0.1f, 1.0f);
    } else if (std::strcmp(name, "elastic") == 0) {
        solver = new OpticalFlowElastic(dimin, 0.5f, 0.0f);
    } else if (std::strcmp(name, "fluid") == 0) {
        solver = new OpticalFlowFluid(dimin, 0.25f, 0.0f);
    } else if (std::strcmp(name, "thirions") == 0) {
        solver = new DemonsThirions(dimin, 1.0f, 0.25f, 2.0f, 2.0f, 5,
                                    MotionAccumulation::Composition);
        demons = true;
    } else if (std::strcmp(name, "diffeo") == 0) {
        solver = new DemonsDiffeomorphic(dimin, 1.0f, 0.25f, 2.0f, 2.0f, 5);
        demons = true;
    } else {
        std::fprintf(stderr, "unknown solver %s\n", name);
        return 2;
    }

    Motion motion(dimin);
    if (!demons) solver->set_derivatives(&Iref, &Imov);
    // warmup
    solver->get_update(&motion, &Iref, &Imov);

    auto t0 = std::chrono::steady_clock::now();
    for (int k = 0; k < iters; k++) {
        solver->get_update(&motion, &Iref, &Imov);
    }
    auto t1 = std::chrono::steady_clock::now();
    double sec = std::chrono::duration<double>(t1 - t0).count();
    double mpix_s = (double)size * iters / sec / 1e6;
    std::printf("{\"solver\": \"%s\", \"pixels\": %zu, \"iters\": %d, "
                "\"seconds\": %.6f, \"mpixels_per_s\": %.3f}\n",
                name, size, iters, sec, mpix_s);
    delete solver;
    return 0;
}

int main(int argc, char** argv) {
    if (argc >= 2 && std::strcmp(argv[1], "bench") == 0) {
        return bench_main(argc, argv);
    }
    if (argc < 11) {
        std::fprintf(stderr,
                     "usage: %s iref imov out_motion out_warped nx ny nscales "
                     "nrefine reg nparams p... niter...\n",
                     argv[0]);
        return 2;
    }
    int a = 1;
    const char* iref_path = argv[a++];
    const char* imov_path = argv[a++];
    const char* out_motion = argv[a++];
    const char* out_warped = argv[a++];
    const int nx = std::atoi(argv[a++]);
    const int ny = std::atoi(argv[a++]);
    const int nscales = std::atoi(argv[a++]);
    const int nrefine = std::atoi(argv[a++]);
    const Regularisation reg = static_cast<Regularisation>(std::atoi(argv[a++]));
    const int nparams = std::atoi(argv[a++]);
    if (argc != a + nparams + (nscales + 1)) {
        std::fprintf(stderr, "expected %d params + %d niter entries\n", nparams,
                     nscales + 1);
        return 2;
    }
    std::vector<float> regparams(nparams);
    for (int p = 0; p < nparams; p++) regparams[p] = (float)std::atof(argv[a++]);
    std::vector<int> niter(nscales + 1);
    for (int s = 0; s < nscales + 1; s++) niter[s] = std::atoi(argv[a++]);
    // Optional: OF2D_ORACLE_VERBOSE=1 turns on the reference Logger prints
    // (Iteration: k\tError:e lines on stderr) for trace-parity tests.
    const bool verbose = std::getenv("OF2D_ORACLE_VERBOSE") != NULL;

    const dim dimin((unsigned)nx, (unsigned)ny);
    const size_t size = (size_t)nx * ny;

    try {
        ImageRegistration* regobj = NULL;
        const Verbose verb = verbose ? Verbose::On : Verbose::Off;
        if (reg == Regularisation::Diffusion || reg == Regularisation::Curvature ||
            reg == Regularisation::Elastic) {
            regobj = new ImageRegistrationOpticalFlow(
                dimin, nscales, niter.data(), nrefine, reg, regparams.data(),
                (unsigned)nparams, verb);
        } else if (reg == Regularisation::ThirionsDemons ||
                   reg == Regularisation::DiffeomorphicDemons) {
            regobj = new ImageRegistrationDemons(
                dimin, nscales, niter.data(), nrefine, reg, regparams.data(),
                (unsigned)nparams, verb);
        } else if (reg == Regularisation::Fluid) {
            regobj = new ImageRegistrationFluid(
                dimin, nscales, niter.data(), nrefine, reg, regparams.data(),
                (unsigned)nparams, verb);
        } else {
            std::fprintf(stderr, "invalid regularisation %d\n", (int)reg);
            return 2;
        }

        std::vector<double> iref_buf = read_raw(iref_path, size);
        std::vector<double> imov_buf = read_raw(imov_path, size);

        Image Iref(dimin), Imov(dimin);
        Iref.set_image(iref_buf.data());
        Imov.set_image(imov_buf.data());
        regobj->set_reference_image(Iref);
        regobj->set_moving_image(Imov);

        regobj->estimate_motion();

        // Repeated-register mode (OF2D_ORACLE_PAIR2="iref2:imov2"): run a
        // SECOND register call on the same persistent object, exactly as
        // the MEX wrapper does across OpticalFlow2d(Iref, Imov) calls
        // (WrapperOpticalFlow2d.cpp:86-102). The outputs then reflect the
        // warm-continued second call (stale motion[nscales],
        // ImageRegistration.cpp:137-139).
        if (const char* pair2 = std::getenv("OF2D_ORACLE_PAIR2")) {
            std::string spec(pair2);
            size_t colon = spec.find(':');
            if (colon == std::string::npos)
                throw std::runtime_error("OF2D_ORACLE_PAIR2 must be iref2:imov2");
            std::vector<double> iref2 = read_raw(spec.substr(0, colon).c_str(), size);
            imov_buf = read_raw(spec.substr(colon + 1).c_str(), size);
            Image Iref2(dimin), Imov2(dimin);
            Iref2.set_image(iref2.data());
            Imov2.set_image(imov_buf.data());
            regobj->set_reference_image(Iref2);
            regobj->set_moving_image(Imov2);
            regobj->estimate_motion();
        }

        Motion motion(dimin);
        regobj->copy_estimated_motion(motion);
        std::vector<double> mo(2 * size);
        motion.copy_motion_to_input(mo.data());
        write_raw(out_motion, mo);

        Image Iwar(dimin);
        Iwar.set_image(imov_buf.data());
        Iwar.warp2d(*regobj->get_estimated_motion());
        std::vector<double> war(size);
        Iwar.copy_image_to_input(war.data());
        write_raw(out_warped, war);

        delete regobj;
    } catch (const std::exception& e) {
        std::fprintf(stderr, "oracle error: %s\n", e.what());
        return 1;
    }
    return 0;
}

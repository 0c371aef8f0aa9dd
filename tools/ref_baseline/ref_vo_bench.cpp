// ref_vo_bench: minimal driver to measure the reference GF-PL-SLAM StVO
// (points+lines tracking + line cutting + pose optimization) on a directory
// of rectified stereo PNGs. Mirrors plstvo_dataset's frame loop without its
// Boost/yaml-cpp/MRPT dependencies (none of which exist in this image).
// Usage: ref_vo_bench <dir> <n_frames> <fx> <fy> <cx> <cy> <baseline>
// Expects <dir>/l_%06d.png and <dir>/r_%06d.png, writes TUM-ish poses to
// stdout and timing to stderr.
#include <stereoFrame.h>
#include <stereoFrameHandler.h>
#include <opencv2/imgcodecs.hpp>
#include <chrono>
#include <execinfo.h>
#include <csignal>
static void segv_handler(int sig) {
    void* bt[64];
    int n = backtrace(bt, 64);
    backtrace_symbols_fd(bt, n, 2);
    _exit(139);
}
#include <cstdio>

using namespace StVO;

int main(int argc, char** argv) {
    signal(SIGSEGV, segv_handler);
    signal(SIGABRT, segv_handler);
    if (argc < 8) { fprintf(stderr, "args\n"); return 1; }
    std::string dir = argv[1];
    int n = atoi(argv[2]);
    double fx = atof(argv[3]), fy = atof(argv[4]);
    double cx = atof(argv[5]), cy = atof(argv[6]), bl = atof(argv[7]);
    cv::Mat img0 = cv::imread(dir + "/l_000000.png", cv::IMREAD_GRAYSCALE);
    PinholeStereoCamera* cam = new PinholeStereoCamera(
        img0.cols, img0.rows, fx, fy, cx, cy, bl);
    StereoFrameHandler* StVO = new StereoFrameHandler(cam);
    Eigen::Matrix4d Tfw = Eigen::Matrix4d::Identity();
    double total_ms = 0.0;
    char buf[64];
    for (int k = 0; k < n; k++) {
        snprintf(buf, sizeof buf, "/l_%06d.png", k);
        cv::Mat il = cv::imread(dir + buf, cv::IMREAD_GRAYSCALE);
        snprintf(buf, sizeof buf, "/r_%06d.png", k);
        cv::Mat ir = cv::imread(dir + buf, cv::IMREAD_GRAYSCALE);
        if (il.empty() || ir.empty()) { fprintf(stderr, "missing %d\n", k); return 1; }
        if (k == 0) { StVO->initialize(il, ir, 0, 0.0); continue; }
        auto t0 = std::chrono::steady_clock::now();
        StVO->insertStereoPair(il, ir, k, k / 20.0);
        StVO->optimizePose(StVO->prev_frame->DT);
        auto t1 = std::chrono::steady_clock::now();
        total_ms += std::chrono::duration<double, std::milli>(t1 - t0).count();
        Tfw = Tfw * StVO->curr_frame->DT;
        printf("%d", k);
        for (int r = 0; r < 3; r++)
            for (int c = 0; c < 4; c++) printf(" %.9f", Tfw(r, c));
        printf("\n");
        StVO->updateFrame();
    }
    fprintf(stderr, "frames=%d total_track_ms=%.1f ms_per_frame=%.2f fps=%.2f\n",
            n - 1, total_ms, total_ms / (n - 1), 1000.0 * (n - 1) / total_ms);
    return 0;
}

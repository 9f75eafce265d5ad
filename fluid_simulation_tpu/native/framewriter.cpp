// Native async frame writer.
//
// The reference writes 11.3 MB of frames per step on the simulation thread
// (simulation.cpp:140-148), stalling the step loop. This writer copies each
// frame into a bounded ring buffer and flushes on a background thread, so
// the device loop never blocks on disk. C ABI for ctypes.

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
    std::vector<std::vector<char>> payloads;  // one per file (may be empty)
};

struct Writer {
    std::vector<FILE*> files;
    std::deque<Frame> queue;
    std::mutex mu;
    std::condition_variable cv_push, cv_pop;
    std::thread worker;
    bool closing = false;
    size_t max_queued;

    explicit Writer(size_t max_q) : max_queued(max_q) {}

    void run() {
        for (;;) {
            Frame fr;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_pop.wait(lk, [&] { return closing || !queue.empty(); });
                if (queue.empty()) return;   // closing && drained
                fr = std::move(queue.front());
                queue.pop_front();
            }
            cv_push.notify_one();
            for (size_t f = 0; f < files.size(); ++f) {
                if (!fr.payloads[f].empty())
                    fwrite(fr.payloads[f].data(), 1, fr.payloads[f].size(),
                           files[f]);
            }
        }
    }
};

}  // namespace

extern "C" {

void* fstpu_fw_open(const char** paths, int n_files, long max_queued) {
    Writer* w = new Writer((size_t)(max_queued > 0 ? max_queued : 8));
    for (int i = 0; i < n_files; ++i) {
        FILE* f = fopen(paths[i], "wb");
        if (!f) {
            for (FILE* g : w->files) fclose(g);
            delete w;
            return nullptr;
        }
        w->files.push_back(f);
    }
    w->worker = std::thread([w] { w->run(); });
    return w;
}

// ptrs[i] may be null to skip file i this frame; sizes in bytes.
int fstpu_fw_append(void* handle, const char** ptrs, const long* sizes) {
    Writer* w = static_cast<Writer*>(handle);
    if (!w) return -1;
    Frame fr;
    fr.payloads.resize(w->files.size());
    for (size_t i = 0; i < w->files.size(); ++i) {
        if (ptrs[i] && sizes[i] > 0)
            fr.payloads[i].assign(ptrs[i], ptrs[i] + sizes[i]);
    }
    {
        std::unique_lock<std::mutex> lk(w->mu);
        w->cv_push.wait(lk, [&] { return w->queue.size() < w->max_queued; });
        w->queue.push_back(std::move(fr));
    }
    w->cv_pop.notify_one();
    return 0;
}

void fstpu_fw_close(void* handle) {
    Writer* w = static_cast<Writer*>(handle);
    if (!w) return;
    {
        std::lock_guard<std::mutex> lk(w->mu);
        w->closing = true;
    }
    w->cv_pop.notify_all();
    w->worker.join();
    for (FILE* f : w->files) fclose(f);
    delete w;
}

}  // extern "C"

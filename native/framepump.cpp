// framepump: native ring-buffer pipe reader/writer for raw video frames.
//
// Role: the host-side data plane of the stream layer. The reference
// delegates this to Python threads reading ffmpeg's stdout into fresh
// PyBytes objects per frame (src/stream/twitch_realtime_handler/
// twitchhandler.py:99-115) — at 1080p60 that is ~370 MB/s of allocation
// churn through the GIL. Here a pthread reads full frames from the pipe
// fd into a preallocated ring of slots; Python (ctypes) grabs frames by
// copying into caller-owned numpy buffers, entirely outside the GIL.
// A paced writer drains a second ring into the encoder pipe at a fixed
// frame period with an absolute monotonic deadline schedule (the native
// twin of stream/output.py's _PacedChannel).
//
// Plain C ABI; built as libframepump.so via native/Makefile and loaded
// with ctypes (sharkshark_tpu/stream/native.py).

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

#include <errno.h>
#include <time.h>
#include <unistd.h>

namespace {

struct Ring {
    std::vector<uint8_t> storage;
    size_t frame_bytes = 0;
    int capacity = 0;
    int head = 0;  // next slot to pop
    int size = 0;  // occupied slots
    std::mutex mu;
    std::condition_variable not_empty;
    std::condition_variable not_full;

    uint8_t* slot(int i) { return storage.data() + (size_t)i * frame_bytes; }
};

bool read_full(int fd, uint8_t* dst, size_t n) {
    size_t got = 0;
    while (got < n) {
        ssize_t r = read(fd, dst + got, n - got);
        if (r == 0) return false;  // EOF
        if (r < 0) {
            if (errno == EINTR) continue;
            return false;
        }
        got += (size_t)r;
    }
    return true;
}

bool write_full(int fd, const uint8_t* src, size_t n) {
    size_t put = 0;
    while (put < n) {
        ssize_t r = write(fd, src + put, n - put);
        if (r < 0) {
            if (errno == EINTR) continue;
            return false;
        }
        put += (size_t)r;
    }
    return true;
}

}  // namespace

// ---------------------------------------------------------------------------
// Reader pump: pipe fd -> ring -> grab()
// ---------------------------------------------------------------------------

struct Pump {
    Ring ring;
    int fd = -1;
    std::thread reader;
    std::atomic<bool> stop{false};
    std::atomic<bool> eof{false};
    std::atomic<uint64_t> frames_read{0};
    std::atomic<uint64_t> frames_dropped{0};
    bool drop_when_full = false;

    void run() {
        std::vector<uint8_t> spill;  // used only when dropping
        while (!stop.load()) {
            uint8_t* dst;
            int slot_idx = -1;
            {
                std::unique_lock<std::mutex> lk(ring.mu);
                if (ring.size == ring.capacity) {
                    if (drop_when_full) {
                        lk.unlock();
                        if (spill.empty()) spill.resize(ring.frame_bytes);
                        if (!read_full(fd, spill.data(), ring.frame_bytes)) {
                            eof.store(true);
                            ring.not_empty.notify_all();
                            return;
                        }
                        frames_dropped.fetch_add(1);
                        continue;
                    }
                    ring.not_full.wait(lk, [&] {
                        return ring.size < ring.capacity || stop.load();
                    });
                    if (stop.load()) return;
                }
                slot_idx = (ring.head + ring.size) % ring.capacity;
                dst = ring.slot(slot_idx);
            }
            if (!read_full(fd, dst, ring.frame_bytes)) {
                eof.store(true);
                ring.not_empty.notify_all();
                return;
            }
            {
                std::lock_guard<std::mutex> lk(ring.mu);
                ring.size += 1;
            }
            frames_read.fetch_add(1);
            ring.not_empty.notify_one();
        }
    }
};

extern "C" {

Pump* pump_create(int fd, size_t frame_bytes, int capacity, int drop_when_full) {
    Pump* p = new Pump();
    p->fd = fd;
    p->drop_when_full = drop_when_full != 0;
    p->ring.frame_bytes = frame_bytes;
    p->ring.capacity = capacity;
    p->ring.storage.resize(frame_bytes * (size_t)capacity);
    p->reader = std::thread([p] { p->run(); });
    return p;
}

// Copy the next frame into dst. Returns 1 on success, 0 on timeout,
// -1 on EOF with the ring drained.
int pump_grab(Pump* p, uint8_t* dst, int timeout_ms) {
    std::unique_lock<std::mutex> lk(p->ring.mu);
    bool ok = p->ring.not_empty.wait_for(
        lk, std::chrono::milliseconds(timeout_ms),
        [&] { return p->ring.size > 0 || p->eof.load() || p->stop.load(); });
    if (!ok) return 0;
    if (p->ring.size == 0) return p->eof.load() ? -1 : 0;
    std::memcpy(dst, p->ring.slot(p->ring.head), p->ring.frame_bytes);
    p->ring.head = (p->ring.head + 1) % p->ring.capacity;
    p->ring.size -= 1;
    p->ring.not_full.notify_one();
    return 1;
}

int pump_depth(Pump* p) {
    std::lock_guard<std::mutex> lk(p->ring.mu);
    return p->ring.size;
}

int pump_eof(Pump* p) { return p->eof.load() ? 1 : 0; }
uint64_t pump_frames_read(Pump* p) { return p->frames_read.load(); }
uint64_t pump_frames_dropped(Pump* p) { return p->frames_dropped.load(); }

// Non-destructive cross-thread stop: raise the stop/eof flags and wake
// every waiter (a grab() blocked in pump_grab, the reader blocked on
// not_full) WITHOUT freeing the Pump. Another thread may still be inside
// pump_grab on this Pump — pump_destroy here would delete the mutex/
// condvar it is waiting on (use-after-free). The thread that owns grab()
// calls pump_destroy() afterwards to join the reader and free.
// The flag stores happen under the ring mutex so a waiter cannot
// evaluate its predicate between our store and notify and then sleep
// through the wakeup. Buffered frames stay drainable (grab keeps
// returning them until the ring is empty, then reports EOF).
void pump_shutdown(Pump* p) {
    {
        std::lock_guard<std::mutex> lk(p->ring.mu);
        p->stop.store(true);
        p->eof.store(true);
    }
    p->ring.not_full.notify_all();
    p->ring.not_empty.notify_all();
}

void pump_destroy(Pump* p) {
    {
        std::lock_guard<std::mutex> lk(p->ring.mu);
        p->stop.store(true);
    }
    p->ring.not_full.notify_all();
    p->ring.not_empty.notify_all();
    // unblock a reader stuck in read(): close our end
    if (p->reader.joinable()) {
        // closing fd is the owner's job (subprocess pipe); detach-safe join:
        p->reader.join();
    }
    delete p;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Paced sink: put() -> ring -> writer thread at fixed fps -> pipe fd
// ---------------------------------------------------------------------------

struct Sink {
    Ring ring;
    int fd = -1;
    double period_s = 1.0 / 24.0;
    bool realtime = true;
    std::thread writer;
    std::atomic<bool> stop{false};
    std::atomic<bool> broken{false};
    std::atomic<uint64_t> sent{0};
    std::atomic<uint64_t> underruns{0};
    std::vector<uint8_t> last;

    void run() {
        // wait for the first frame so the stream starts aligned
        {
            std::unique_lock<std::mutex> lk(ring.mu);
            ring.not_empty.wait(lk, [&] { return ring.size > 0 || stop.load(); });
            if (stop.load()) return;
        }
        auto deadline = std::chrono::steady_clock::now();
        while (!stop.load()) {
            const uint8_t* src = nullptr;
            {
                std::unique_lock<std::mutex> lk(ring.mu);
                if (ring.size > 0) {
                    std::memcpy(last.data(), ring.slot(ring.head), ring.frame_bytes);
                    ring.head = (ring.head + 1) % ring.capacity;
                    ring.size -= 1;
                    ring.not_full.notify_one();
                    src = last.data();
                } else if (realtime && !last.empty()) {
                    underruns.fetch_add(1);
                    src = last.data();
                }
            }
            if (src != nullptr) {
                if (!write_full(fd, src, ring.frame_bytes)) {
                    broken.store(true);
                    return;
                }
                sent.fetch_add(1);
            }
            if (realtime) {
                deadline += std::chrono::duration_cast<
                    std::chrono::steady_clock::duration>(
                    std::chrono::duration<double>(period_s));
                auto now = std::chrono::steady_clock::now();
                if (deadline > now) {
                    std::this_thread::sleep_until(deadline);
                } else {
                    deadline = now;  // fell behind: resync, don't burst
                }
            } else {
                std::unique_lock<std::mutex> lk(ring.mu);
                ring.not_empty.wait(lk, [&] { return ring.size > 0 || stop.load(); });
            }
        }
    }
};

extern "C" {

Sink* sink_create(int fd, size_t frame_bytes, int capacity, double fps,
                  int realtime) {
    Sink* s = new Sink();
    s->fd = fd;
    s->period_s = 1.0 / fps;
    s->realtime = realtime != 0;
    s->ring.frame_bytes = frame_bytes;
    s->ring.capacity = capacity;
    s->ring.storage.resize(frame_bytes * (size_t)capacity);
    s->last.resize(frame_bytes);
    s->writer = std::thread([s] { s->run(); });
    return s;
}

// Returns 1 when queued, 0 when the buffer is full (caller drops).
int sink_put(Sink* s, const uint8_t* frame) {
    {
        std::lock_guard<std::mutex> lk(s->ring.mu);
        if (s->ring.size == s->ring.capacity) return 0;
        int slot_idx = (s->ring.head + s->ring.size) % s->ring.capacity;
        std::memcpy(s->ring.slot(slot_idx), frame, s->ring.frame_bytes);
        s->ring.size += 1;
    }
    s->ring.not_empty.notify_one();
    return 1;
}

int sink_depth(Sink* s) {
    std::lock_guard<std::mutex> lk(s->ring.mu);
    return s->ring.size;
}

int sink_broken(Sink* s) { return s->broken.load() ? 1 : 0; }
uint64_t sink_sent(Sink* s) { return s->sent.load(); }
uint64_t sink_underruns(Sink* s) { return s->underruns.load(); }

// Drain remaining frames (non-realtime write-through) then stop.
void sink_destroy(Sink* s, int drain) {
    if (drain) {
        for (;;) {
            {
                std::lock_guard<std::mutex> lk(s->ring.mu);
                if (s->ring.size == 0 || s->broken.load()) break;
            }
            struct timespec ts = {0, 1000000};  // 1 ms
            nanosleep(&ts, nullptr);
        }
    }
    s->stop.store(true);
    s->ring.not_empty.notify_all();
    s->ring.not_full.notify_all();
    if (s->writer.joinable()) s->writer.join();
    delete s;
}

}  // extern "C"

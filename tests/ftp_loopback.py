"""Minimal loopback FTP server — just enough of RFC 959 for ftplib's
connect / USER+PASS / TYPE / PASV / RETR / QUIT sequence. A test double
standing in for a real FTP daemon (pyftpdlib is not bundled in this
environment); the client under test is the real stdlib ftplib wired
into the source registry's fetch protocols."""

from __future__ import annotations

import os
import socket
import threading


class LoopbackFtpServer:
    def __init__(self, root: str):
        self.root = root
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(5)
        self.port = self.sock.getsockname()[1]
        self.logins: list[tuple[str, str]] = []
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True)

    def start(self) -> "LoopbackFtpServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop = True
        try:
            self.sock.close()
        except OSError:
            pass

    # -- internals -------------------------------------------------------
    def _serve(self) -> None:
        while not self._stop:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(
                target=self._session, args=(conn,), daemon=True
            ).start()

    def _session(self, conn: socket.socket) -> None:
        f = conn.makefile("rwb")

        def send(line: str) -> None:
            f.write((line + "\r\n").encode())
            f.flush()

        send("220 loopback ready")
        data_listener: socket.socket | None = None
        user = ""
        while True:
            raw = f.readline()
            if not raw:
                break
            cmd, _, arg = raw.decode().rstrip("\r\n").partition(" ")
            cmd = cmd.upper()
            if cmd == "USER":
                user = arg
                send("331 password required")
            elif cmd == "PASS":
                self.logins.append((user, arg))
                send("230 logged in")
            elif cmd == "TYPE":
                send("200 type set")
            elif cmd == "PASV":
                data_listener = socket.socket()
                data_listener.bind(("127.0.0.1", 0))
                data_listener.listen(1)
                p = data_listener.getsockname()[1]
                send(f"227 Entering Passive Mode (127,0,0,1,{p >> 8},{p & 255})")
            elif cmd == "RETR":
                path = os.path.join(self.root, arg.lstrip("/"))
                if data_listener is None:
                    send("425 use PASV first")
                elif not os.path.exists(path):
                    send("550 not found")
                else:
                    send("150 opening data connection")
                    d, _ = data_listener.accept()
                    with open(path, "rb") as src:
                        d.sendall(src.read())
                    d.close()
                    data_listener.close()
                    data_listener = None
                    send("226 transfer complete")
            elif cmd == "QUIT":
                send("221 bye")
                break
            else:
                send("502 not implemented")
        try:
            f.close()
            conn.close()
        except OSError:
            pass
